"""Reference-faithful CLI surface (pro_b_gan_infer.py:340-511) and installer."""
