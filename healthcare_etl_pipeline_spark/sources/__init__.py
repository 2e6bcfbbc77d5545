"""Warehouse table definitions and read/write helpers."""
