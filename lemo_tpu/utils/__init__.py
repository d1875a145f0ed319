"""Shared utilities: logging, output formats."""
