"""Scalar expression library."""
