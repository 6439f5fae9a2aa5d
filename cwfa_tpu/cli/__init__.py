"""Command-line entry points (reference L6: main.py, main_deconvolve_dataset.py)."""
