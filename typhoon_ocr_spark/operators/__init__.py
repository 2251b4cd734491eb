"""Operators: staged DataFrame transforms (the engine's query surface)."""

from .extract import extract_pages, assemble_documents, extract_documents

__all__ = ["extract_pages", "assemble_documents", "extract_documents"]
