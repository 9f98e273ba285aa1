"""Command-line entry points (reference src/train_test.py CLI preserved)."""
