"""Ordered parts of the oracle-pair registry — see oracle_pairs (the facade) for the import contract."""
