"""Plan introspection helpers (Catalyst does the optimizing; these
helpers make the chosen physical plan assertable in tests)."""
