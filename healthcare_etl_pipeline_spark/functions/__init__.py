"""Column-level functions and Pandas UDFs."""
