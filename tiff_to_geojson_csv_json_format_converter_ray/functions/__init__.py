"""Pure-NumPy kernels: affine, CRS, cell index, geometry, kNN, hashing, text."""
