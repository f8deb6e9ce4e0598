"""Drop-in ``modular_prot_b_gan`` module (the reference's missing import).

The reference's inference script imports its models as
``from modular_prot_b_gan import ModularGenerator, ModularDiscriminator``
(pro_b_gan_infer.py:41), but no such module exists in the reference repo
(SURVEY.md §0.1). This shim provides that exact import surface over the
framework's JAX models (probgan_tpu/models/kg_gan.py) so user code written
against the reference keeps working:

    from modular_prot_b_gan import ModularGenerator, ModularDiscriminator

    gen = ModularGenerator(embed_dim=128, noise_dim=64)
    gen.load_state_dict(checkpoint["generator"])   # torch-style or native
    gen.to("auto").eval()
    t_hat = gen(h_emb, r_emb)                      # noise sampled internally

    disc = ModularDiscriminator(embed_dim=128, hidden_dim=1024)
    disc.load_state_dict(checkpoint["discriminator"])
    logits, probs = disc.score_triplets(node_emb, rel_emb, triplets)
"""

from probgan_tpu.models.modular import ModularDiscriminator, ModularGenerator

__all__ = ["ModularGenerator", "ModularDiscriminator"]
