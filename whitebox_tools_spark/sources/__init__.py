"""Corpus generators, driver-table loaders, fixture layers."""
