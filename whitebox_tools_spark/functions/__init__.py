"""Column-expression and numpy-kernel building blocks."""
