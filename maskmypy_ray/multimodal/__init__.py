"""Multimodal (binary-column) stages: metadata, decode/resize stubs."""
