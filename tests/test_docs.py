"""docs/API.md generator smoke test: every public module imports and renders."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_gen_api_docs_covers_every_module(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import gen_api_docs
    finally:
        sys.path.pop(0)

    out = tmp_path / "API.md"
    gen_api_docs.main(str(out))
    text = out.read_text()

    # one section per public module under gan_ffn_tpu (no import failures)
    import pkgutil

    import gan_ffn_tpu

    modules = ["gan_ffn_tpu"] + [
        info.name
        for info in pkgutil.walk_packages(gan_ffn_tpu.__path__, prefix="gan_ffn_tpu.")
        if not info.name.rsplit(".", 1)[-1].startswith("_")
    ]
    for name in modules:
        assert f"## `{name}`" in text, f"missing section for {name}"
    # spot-check load-bearing entries render with signatures
    assert "### `GAN_FFN`" in text
    assert "### `make_gan_train_step" in text
    assert "### `fused_attention" in text

    # drift guard: the committed docs/API.md must match what the generator
    # produces at HEAD (regenerate with `python scripts/gen_api_docs.py`).
    # Signature/default reprs vary across jax/flax releases, so byte
    # equality is only enforced when this environment matches the versions
    # stamped into the committed page; otherwise the per-module coverage
    # assertions above are the guard.
    import flax
    import jax

    committed = (REPO / "docs" / "API.md").read_text()
    stamp = f"<!-- generated with jax {jax.__version__}, flax {flax.__version__} -->"
    if stamp in committed:
        assert text == committed, (
            "docs/API.md is stale — run `python scripts/gen_api_docs.py`"
        )
