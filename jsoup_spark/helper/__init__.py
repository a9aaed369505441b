"""Interop helpers (reference org/jsoup/helper analogs)."""
