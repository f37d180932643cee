"""Corpus synthesis and readers."""
