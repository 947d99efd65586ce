"""Sources: deterministic synthetic transcript generation and views."""
