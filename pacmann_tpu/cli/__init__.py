"""Command-line drivers (reference L5): private-search, ann, cluster-search."""
