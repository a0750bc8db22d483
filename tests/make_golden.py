"""Generate the golden regression fixture (tests/golden_tiny.npz).

Run once on a verified build (the outputs were cross-checked against the
eager-PyTorch oracle in tests/test_parity.py) — future refactors compare
against the stored values without needing torch:

    python tests/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.models import construct_ppnet

BK = BackboneConfig(
    name="golden-tiny", arch="deit", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.0,
)
PP = PPNetConfig(
    prototype_shape=(40, 16, 1, 1), num_classes=4,
    reserve_layers=(2,), reserve_token_nums=(9,),
    use_global=True, global_proto_per_class=3,
)


def build():
    model = construct_ppnet(BK, PP)
    rng = np.random.default_rng(1028)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(1028), x)["params"]
    out = model.apply({"params": params}, x)
    return x, out


if __name__ == "__main__":
    x, out = build()
    path = os.path.join(os.path.dirname(__file__), "golden_tiny.npz")
    np.savez_compressed(
        path,
        image=np.asarray(x),
        logits=np.asarray(out.logits),
        cls_token_attn=np.asarray(out.cls_token_attn),
        distances=np.asarray(out.distances),
        logits_global=np.asarray(out.logits_global),
        logits_local=np.asarray(out.logits_local),
    )
    print(f"wrote {path}")
