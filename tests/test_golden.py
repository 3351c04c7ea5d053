"""Golden-output regression tests.

The analog of the reference's printout oracles (test-yolo2/test-classify
print first/last rows for eyeball comparison — SURVEY.md §4.2), made
mechanical: tiny fixed-seed models' fp32 outputs are frozen into
tests/golden/*.npz; any change to IR parsing, lowering, fusion passes,
or executor wiring that shifts numerics past fp32 noise fails here even
without torch installed. Regenerate deliberately with:

    python tests/test_golden.py --regen
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")


def _cases():
    from simpleinfer_tpu.zoo import (
        build_bert,
        build_densenet,
        build_llama,
        build_mobilenet_like,
        build_resnet18,
        build_resnet50,
        build_unet,
        build_vit,
        build_yolov5,
    )

    return {
        # the qwen3/gemma2 attention features frozen as fp32 goldens
        # (round-4): qk-norm + decoupled head_dim; sandwich-free zoo
        # form of attn-scale + tanh softcapping + alternating sliding
        "llama_qwen3ish": (build_llama,
                           dict(variant="nano", batch=1, seq_len=16,
                                vocab_size=32, qk_norm=True,
                                head_dim=24, seed=4)),
        "llama_gemma2ish": (build_llama,
                            dict(variant="nano", batch=1, seq_len=16,
                                 vocab_size=32, attn_scale=0.3,
                                 logit_softcap=25.0, sliding_window=5,
                                 sliding_pattern="alternate", seed=4)),
        "resnet18": (build_resnet18,
                     dict(batch=2, image_size=32, num_classes=7, width=8)),
        "resnet50": (build_resnet50,
                     dict(batch=1, image_size=32, num_classes=5, width=8)),
        "mobilenet": (build_mobilenet_like,
                      dict(batch=1, image_size=32, num_classes=6,
                           width_mult=0.5)),
        "yolov5n": (build_yolov5,
                    dict(variant="n", batch=1, image_size=32)),
        "densenet": (build_densenet,
                     dict(variant=(2, 2), batch=1, image_size=32,
                          num_classes=6, growth_rate=4, init_width=8)),
        "unet": (build_unet,
                 dict(batch=1, image_size=32, num_classes=4, width=8,
                      depth=2)),
        "vit": (build_vit,
                dict(variant="tiny", batch=1, image_size=32, patch_size=8,
                     num_classes=6, depth=2, embed_dim=32, num_heads=4)),
        "bert": (build_bert,
                 dict(variant="tiny", batch=2, seq_len=16, vocab_size=64,
                      num_classes=4, depth=2, hidden=32, num_heads=4)),
    }


def _run(name):
    from simpleinfer_tpu import Engine

    build, kw = _cases()[name]
    graph, in_name, out_name = build(**kw)
    batch = kw.get("batch", 1)
    rng = np.random.default_rng(1234)
    if "seq_len" in kw:  # text model: integer token ids
        x = rng.integers(0, kw["vocab_size"],
                         size=(batch, kw["seq_len"])).astype(np.float32)
    else:
        size = kw.get("image_size")
        x = rng.standard_normal(
            (batch, size, size, 3)).astype(np.float32) / 3
    out = Engine().load_model(None, graph=graph).run({in_name: x})
    return out[out_name]


@pytest.mark.parametrize("name", sorted(_cases()))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file missing; run tests/test_golden.py --regen")
    want = np.load(path)["out"]
    got = _run(name)
    assert got.shape == want.shape
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=5e-4 * scale, rtol=5e-4)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")  # deterministic source
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in sorted(_cases()):
            out = _run(name)
            np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                                out=out)
            print(f"{name}: {out.shape} saved")
    else:
        print(__doc__)
