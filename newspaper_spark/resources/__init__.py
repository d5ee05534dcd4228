"""data resources."""
