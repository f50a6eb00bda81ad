"""System facade + CLI."""
