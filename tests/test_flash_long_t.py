"""Long-sequence parity for the KV-blocked flash kernel (VERDICT r4 item 4).

The existing flash tests force multi-KV blocking with a shrunken VMEM budget at
t=300; this runs the kernel at a REAL long-T shape — t=5330, the token count of
1022px ViT-B/14 feature extraction ((1022//14)^2 + 1), where the (T, T) softmax
cannot fit VMEM and the reference would need its -fa path
(/root/reference/dinov2.cpp:499-525). Interpret mode on CPU; the on-chip twin
(numbers + parity at full model dims) is scripts/bench_longT.py.
"""

import jax.numpy as jnp
import numpy as np

import dinov2_tpu.ops.flash_attention as fa
from dinov2_tpu.ops.attention import vanilla_attention


def test_flash_long_t_matches_vanilla(rng):
    b, t, h, hd = 1, 5330, 2, 64
    q, k, v = [
        jnp.asarray(rng.standard_normal((b, t, h, hd)) * 0.5, jnp.float32)
        for _ in range(3)
    ]
    scale = 1.0 / hd**0.5

    # the default budget must pick a genuinely KV-blocked schedule here
    bq, bk, tp = fa._pick_blocks(t, hd, 2048)
    assert tp // bk >= 2, "long T must run multi-KV online softmax"

    want = np.asarray(vanilla_attention(q, k, v, scale))
    got = np.asarray(fa.flash_attention(q, k, v, scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
