"""Batch inference entry point.

The reference has no inference path at all — its "best model" exists only as
in-memory metrics during training (SURVEY.md §5: classifier stage has no
checkpointing). Here the trainers save the best classifier snapshot
(``--model-save-path/classifier_best.msgpack``) and this CLI loads it to
classify a feature pickle, emitting per-utterance predictions and the usual
report.

Run: ``python -m gan_ffn_tpu.cli.predict --data-path .../IEMOCAP_features.pkl``
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import IEMOCAPDataset, BucketedLoader
from ..evaluation.metrics import classification_report, confusion_matrix, f1_score
from ..models import GAN_FFN
from ..train.loop import batch_to_arrays
from ..utils.checkpoint import load_params_any_layout


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GAN_FFN batch inference")
    p.add_argument("--data-path", default="data/iemocap/IEMOCAP_features.pkl")
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--model-save-path", default="./GAN_save/")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-layers", type=int, default=8)
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--output", default=None, help="write per-utterance JSON here")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    from ..utils.runtime import configure_tpu_runtime, wait_for_device

    configure_tpu_runtime()
    wait_for_device()

    dtype = jnp.bfloat16 if args.bf16 else None
    model = GAN_FFN(n_classes=6, gen_num_layers=args.num_layers, dtype=dtype)
    ds = IEMOCAPDataset(args.data_path, train=(args.split == "train"))
    loader = BucketedLoader(ds, batch_size=args.batch_size, shuffle=False)

    sample = batch_to_arrays(next(iter(loader)))
    from ..utils.aot import ShapeDispatchingAOT, cached_init

    template = cached_init(
        model, jax.random.PRNGKey(0),
        sample["audio"], sample["visual"], sample["text"], salt="init_gan_ffn",
    )
    ckpt = os.path.join(args.model_save_path, "classifier_best.msgpack")
    # accepts checkpoints written under --scan-layers too
    params = load_params_any_layout(ckpt, template)
    print(f"loaded classifier from {ckpt}")

    def infer_fn(params, batch):
        log_prob, *_ = model.apply(
            {"params": params}, batch["audio"], batch["visual"], batch["text"],
            valid_len=batch["valid_len"], deterministic=True,
        )
        return jnp.argmax(log_prob, axis=2)  # (L, B)

    # one disk-cached executable per bucket shape; params shapes are fixed
    infer = ShapeDispatchingAOT(infer_fn, salt="predict_infer", sig_argnums=(1,))

    per_utt = []
    all_preds, all_labels, all_masks = [], [], []
    for batch in loader:
        arrays = batch_to_arrays(batch)
        preds = np.asarray(infer(params, arrays))  # (L, B)
        for j, vid in enumerate(batch.vids):
            n = int(batch.umask[j].sum())
            labels = [IEMOCAPDataset.label_names[c] for c in preds[:n, j]]
            per_utt.append({"vid": str(vid), "predictions": labels})
        all_preds.append(preds.T.reshape(-1))
        all_labels.append(batch.label.reshape(-1))
        all_masks.append(batch.umask.reshape(-1))

    preds = np.concatenate(all_preds)
    labels = np.concatenate(all_labels)
    masks = np.concatenate(all_masks)
    f1 = round(f1_score(labels, preds, sample_weight=masks, average="weighted") * 100, 2)
    print(f"weighted F1 on {args.split}: {f1}")
    print(classification_report(labels, preds, sample_weight=masks, digits=4))
    print(confusion_matrix(labels, preds, sample_weight=masks))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(per_utt, f, indent=1)
        print(f"wrote {len(per_utt)} dialogue predictions to {args.output}")
    return {"f1": f1, "n_dialogues": len(per_utt)}


if __name__ == "__main__":
    main()
