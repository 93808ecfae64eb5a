"""Structured Streaming surface (batch twins are oracle-checked in
queries.py; these are the readStream/writeStream pipelines)."""
