"""Data ingestion: vector file formats, streaming batches, ground truth."""
