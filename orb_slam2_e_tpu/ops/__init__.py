"""Numeric ops: Lie groups, camera models, feature kernels, matchers, solvers."""
