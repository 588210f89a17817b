"""Utilities: configuration, logging, tree helpers."""
