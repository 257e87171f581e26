"""Data layer: datasets + canny hint pipeline + latent cache + synthetic
fixtures (reference: dataset/ package, utils/diffusion_utils.py:7-18)."""
