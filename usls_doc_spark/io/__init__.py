"""Sources: deterministic synthetic pages, testdata table loaders."""
