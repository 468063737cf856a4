"""Offline scene-geometry tools: known-pose SfM triangulation and
mask->point-cloud object tagging (the pseudo-label steps that produce the
`colmap-*.ply` static cloud and the per-point `obj` ids `data/readers.py`
consumes)."""
