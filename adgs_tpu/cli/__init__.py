"""Command-line entry points (train / render), mirroring the reference's
train.py / render.py CLI surface."""
