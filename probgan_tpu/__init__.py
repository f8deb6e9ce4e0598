"""probgan_tpu — a TPU-native (JAX / XLA / pjit / Pallas) rebuild of PRO-B-GAN.

This package re-implements, from scratch and TPU-first, the capabilities of the
reference repo Drjay806/PRO-B-GAN (see SURVEY.md):

- ``core``     — runtime: device selection, RNG policy, checkpoint I/O
                 (native msgpack + torch ``.pt`` interop for the reference's
                 checkpoint schema, pro_b_gan_infer.py:74-112).
- ``models``   — the KG-GAN model family inferred from the reference call
                 sites (pro_b_gan_infer.py:41,93-94,143,207,301) and the
                 progressive image-synthesis GAN targeted by BASELINE.json.
- ``ops``      — jnp reference ops and hand-written Pallas TPU kernels for the
                 hot paths (fused rank, fused tanh→uint8 denorm, ...).
- ``engine``   — jitted task implementations behind the public inference API
                 (predict_tails / score_triplets / similar_entities /
                 analyze_relations / model_info / generate_images).
- ``parallel`` — mesh construction and sharded variants (entity-table tensor
                 parallelism, data-parallel batches) via jax.sharding + pjit.
- ``cli``      — the reference-faithful CLI / REPL surface
                 (pro_b_gan_infer.py:340-511) and installer doctor
                 (install_pro_b_gan.py:89-188).
"""

__version__ = "0.1.0"
