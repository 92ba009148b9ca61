"""Scalar-function query surface. Importing a module registers its
queries in the registry."""
