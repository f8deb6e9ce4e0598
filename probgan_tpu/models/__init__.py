"""Model zoo: the reference-faithful KG-GAN and the progressive image GAN."""
