"""Sources: deterministic synthetic web-pages fixture + testdata readers."""
