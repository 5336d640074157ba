"""Transformer-encoder demo over flower pose sets (reference:
scripts/tf_encoder.py — an unused experiment toward attention over the
15-slot padded pose sets produced by the scene dataset). Kept for parity:
a small Flax TransformerEncoder mapping a (B, 15, D) pose-token sequence to a
9-D rotation refinement, demonstrating the intended architecture."""

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seq-len", type=int, default=15)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import flax.linen as nn

    class EncoderLayer(nn.Module):
        dim: int
        heads: int

        @nn.compact
        def __call__(self, x, mask=None):
            y = nn.LayerNorm()(x)
            y = nn.MultiHeadDotProductAttention(num_heads=self.heads)(
                y, y, mask=mask)
            x = x + y
            y = nn.LayerNorm()(x)
            y = nn.Dense(4 * self.dim)(y)
            y = nn.gelu(y)
            return x + nn.Dense(self.dim)(y)

    class PoseSetEncoder(nn.Module):
        dim: int
        heads: int
        layers: int

        @nn.compact
        def __call__(self, tokens, valid):
            x = nn.Dense(self.dim)(tokens)
            mask = valid[:, None, None, :] & valid[:, None, :, None]
            for _ in range(self.layers):
                x = EncoderLayer(self.dim, self.heads)(x, mask)
            return nn.Dense(9)(x)  # per-slot 9-D rotation refinement

    model = PoseSetEncoder(args.dim, args.heads, args.layers)
    tokens = jnp.zeros((2, args.seq_len, 12))  # [t3, r9] pose tokens
    valid = jnp.ones((2, args.seq_len), bool)
    variables = model.init(jax.random.PRNGKey(0), tokens, valid)
    out = model.apply(variables, tokens, valid)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"PoseSetEncoder: in {tokens.shape} -> out {out.shape}, {n} params")


if __name__ == "__main__":
    sys.exit(main())
