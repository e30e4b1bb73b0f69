"""Golden-correctness oracles.

Straight-line NumPy (float64) transcriptions of the reference Fortran
kernels in /root/reference/src/ecwam, kept as TEST FIXTURES ONLY — the
framework implementation in ecwam_tpu/ is an independent vectorized JAX
re-derivation and must never import from here.

Each oracle mirrors the control flow of its Fortran source line-by-line
(loops, early exits, branch order) so that disagreement with the JAX
kernels beyond f64 round-off (~1e-12 relative) indicates a real numerics
bug, not an artifact of the comparison.

Index conventions: arrays are 0-based NumPy, but loop bounds follow the
Fortran 1-based text with explicit ``- 1`` shifts so the transcription can
be audited against the cited source lines.
"""
