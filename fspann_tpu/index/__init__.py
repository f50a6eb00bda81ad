"""Geometric routing index: device-resident partition tables."""
