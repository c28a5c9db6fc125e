"""Sources: deterministic synthetic data generation and table IO."""
