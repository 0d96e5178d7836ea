"""A/B: the reference's BiModel (torch, /root/reference/model.py:981-1062)
vs gan_ffn_tpu's BiModel, trained head-to-head on the SAME synthetic fixture
from the SAME transplanted initialization.

Purpose: settle the round-1 question of whether the DialogueRNN entry
"barely learns" because of a framework backward bug or because the deep
recurrent head genuinely converges slowly. The per-step backward is already
pinned exactly (tests/test_reference_parity.py::test_bimodel_gradient_parity);
this script compares multi-epoch TRAINING TRAJECTORIES under the entry's own
hyperparameters (lr 1e-4, l2 1e-5, dropout 0.6, rec-dropout 0.1, class
weights — train_IEMOCAP_DialogueRNN.py:635-661).

Both sides drive the classifier head directly on the fixture's 100-d text
features (stage B minus the generators, which are transplant-pinned
elsewhere), so the comparison isolates the recurrent stack.

Run (CPU, ~5 min):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ab_dialoguernn_torch_vs_jax.py
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

REFERENCE = "/root/reference"

DIMS = dict(D_m=100, D_g=500, D_p=500, D_e=100, D_h=100)
CLASS_WEIGHTS = [1.2, 0.60072, 0.38066, 0.94019, 0.67924, 0.34332]


def load_refmodel():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "refmodel", os.path.join(REFERENCE, "model.py")
    )
    refmodel = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refmodel)
    return refmodel


def make_batches(path, batch_size, seed):
    from gan_ffn_tpu.data import get_iemocap_loaders
    from gan_ffn_tpu.train.loop import batch_to_arrays

    train_loader, _, _ = get_iemocap_loaders(
        path, batch_size=batch_size, valid=0.1, seed=seed
    )
    batches = []
    for b in train_loader:
        arrays = batch_to_arrays(b, with_visual=False)
        batches.append(
            {
                "U": np.asarray(arrays["text"]),
                "qmask": np.asarray(arrays["qmask"]),
                "umask": np.asarray(arrays["umask"]),
                "label": np.asarray(arrays["label"]),
                "valid_len": int(arrays["valid_len"]),
                "n_real": int(arrays["n_real"]),
            }
        )
    return batches


def train_jax(torch_model, batches, epochs, lr, seed):
    import jax
    import jax.numpy as jnp

    import gan_ffn_tpu.models as M
    from gan_ffn_tpu.nn.losses import masked_nll_loss
    from gan_ffn_tpu.train.optim import torch_adam
    from test_reference_parity import _dialogue_rnn_params  # noqa: E402
    from torch_mapping import linear_params  # noqa: E402

    model = M.BiModel(
        DIMS["D_m"], DIMS["D_g"], DIMS["D_p"], DIMS["D_e"], DIMS["D_h"],
        n_classes=6, listener_state=False, context_attention="general",
        dropout_rec=0.1, dropout=0.6, deterministic=False,
    )
    params = {
        "dialog_rnn_f": _dialogue_rnn_params(torch_model.dialog_rnn_f, "general"),
        "dialog_rnn_r": _dialogue_rnn_params(torch_model.dialog_rnn_r, "general"),
        "linear": linear_params(torch_model.linear),
        "smax_fc": linear_params(torch_model.smax_fc),
        "matchatt": {"transform": linear_params(torch_model.matchatt.transform)},
    }
    params = jax.tree.map(jnp.asarray, params)
    weights = jnp.asarray(CLASS_WEIGHTS)
    opt = torch_adam(lr, weight_decay=1e-5)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng, U, qmask, umask, label):
        def loss_fn(p):
            lp, *_ = model.apply(
                {"params": p}, U, qmask, umask, rngs={"dropout": rng}
            )
            flat = lp.transpose(1, 0, 2).reshape(-1, 6)
            return masked_nll_loss(flat, label.reshape(-1), umask, weights)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed)
    curve = []
    for e in range(epochs):
        tot, msum = 0.0, 0.0
        for b in batches:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, sub,
                jnp.asarray(b["U"]), jnp.asarray(b["qmask"]),
                jnp.asarray(b["umask"]), jnp.asarray(b["label"]),
            )
            m = float(b["umask"].sum())
            tot += float(loss) * m
            msum += m
        curve.append(tot / msum)
    return curve


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=30)
    p.add_argument("--n-train", type=int, default=60)
    p.add_argument("--max-len", type=int, default=40)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--every", type=int, default=10, help="print every N epochs")
    args = p.parse_args()

    from gan_ffn_tpu.data import write_synthetic_iemocap

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "IEMOCAP_features.pkl")
    write_synthetic_iemocap(
        path, n_train=args.n_train, n_test=12, min_len=6, max_len=args.max_len,
        seed=args.seed,
    )
    batches = make_batches(path, args.batch_size, args.seed)
    print(
        f"fixture: {args.n_train} train dialogues, {len(batches)} batches, "
        f"lr={args.lr}, {args.epochs} epochs"
    )

    refmodel = load_refmodel()
    import torch

    torch.manual_seed(args.seed)
    torch_model = refmodel.BiModel(
        DIMS["D_m"], DIMS["D_g"], DIMS["D_p"], DIMS["D_e"], DIMS["D_h"],
        n_classes=6, listener_state=False, context_attention="general",
        dropout_rec=0.1, dropout=0.6,
    )
    import copy

    torch_init = copy.deepcopy(torch_model)

    t0 = time.time()
    jax_curve = train_jax(torch_init, batches, args.epochs, args.lr, args.seed)
    t_jax = time.time() - t0
    t0 = time.time()
    # train the SAME torch module instance (same init) with the reference recipe
    loss_fn = refmodel.MaskedNLLLoss(torch.tensor(CLASS_WEIGHTS))
    opt = torch.optim.Adam(torch_model.parameters(), lr=args.lr, weight_decay=1e-5)
    torch_curve = []
    torch_model.train()
    for e in range(args.epochs):
        tot, msum = 0.0, 0.0
        for b in batches:
            # the reference sees dynamically-padded batches of REAL dialogues
            # (pad to batch max length, dataloader.py:55-58) — trim both the
            # bucket length padding and the fake batch-fill dialogues off
            vl, nr = b["valid_len"], b["n_real"]
            opt.zero_grad()
            umask_t = torch.from_numpy(np.ascontiguousarray(b["umask"][:nr, :vl]))
            lp, *_ = torch_model(
                torch.from_numpy(np.ascontiguousarray(b["U"][:vl, :nr])),
                torch.from_numpy(np.ascontiguousarray(b["qmask"][:vl, :nr])),
                umask_t,
            )
            flat = lp.transpose(0, 1).contiguous().view(-1, 6)
            loss = loss_fn(
                flat,
                torch.from_numpy(
                    np.ascontiguousarray(b["label"][:nr, :vl]).astype(np.int64)
                ).reshape(-1),
                umask_t,
            )
            loss.backward()
            opt.step()
            m = float(b["umask"].sum())
            tot += float(loss.detach()) * m
            msum += m
        torch_curve.append(tot / msum)
    t_torch = time.time() - t0

    print(f"\njax wall {t_jax:.1f}s, torch wall {t_torch:.1f}s")
    print(f"\n{'epoch':>6} {'torch(ref)':>12} {'jax(ours)':>12}")
    for e in range(0, args.epochs, args.every):
        print(f"{e + 1:>6} {torch_curve[e]:>12.4f} {jax_curve[e]:>12.4f}")
    print(f"{args.epochs:>6} {torch_curve[-1]:>12.4f} {jax_curve[-1]:>12.4f}")


if __name__ == "__main__":
    main()
