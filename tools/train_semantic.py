"""Train the DDRNet-style segmentation net on procedural labeled scenes
and ship the weight artifact.

The reference's weights story is "bring a prebuilt TensorRT engine"
(`scripts/trt_interface.py:16-30`); here the artifact is a trained flax
checkpoint committed at ``artifacts/semantic_ddrnet.npz`` (+ metadata
JSON with the achieved mIoU), produced by this script and consumed by
`tests/test_semantic_e2e.py` and the zone-layer pipeline.

Run: python tools/train_semantic.py [--steps 400] [--width 16]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAPILLARY_CSV = ("/root/reference/src/dddmr_semantic_segmentation/data/"
                 "colors_mapillary.csv")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="zones4",
                    choices=["zones4", "mapillary19"],
                    help="zones4: 4-class zone pipeline artifact; "
                    "mapillary19: reference-class 19-class profile "
                    "(classes from colors_mapillary.csv, 240x320, "
                    "generator-independent eval)")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from dddmr_navigation_tpu.perception.semantic import (
        init_segmenter, make_train_step, infer_classes, save_params,
        load_class_map_csv)
    from dddmr_navigation_tpu.perception.semantic_data import (
        CameraIntrinsics, make_batch, miou)
    from dddmr_navigation_tpu.perception import semantic_scene19 as s19
    from dddmr_navigation_tpu.runtime.checkpoint import CheckpointManager

    if args.profile == "zones4":
        cam = CameraIntrinsics()
        hw = (cam.height, cam.width)
        n_classes, width = 4, args.width or 16
        steps = args.steps or 400
        classes = ["background", "floor", "forbidden_zone", "obstacle"]
        out = args.out or os.path.join(REPO, "artifacts",
                                       "semantic_ddrnet.npz")

        def train_batch(rng):
            return make_batch(rng, args.batch, cam)

        def eval_batches(eval_rng):
            return make_batch(eval_rng, 8, cam)
        eval_note = "same generator family, held-out seed"
    else:
        hw = (240, 320)
        n_classes, width = 19, args.width or 32
        steps = args.steps or 900
        if os.path.exists(MAPILLARY_CSV):
            classes, _colors = load_class_map_csv(MAPILLARY_CSV)
            assert classes == s19.CLASS_NAMES, (classes, s19.CLASS_NAMES)
        else:
            classes = s19.CLASS_NAMES
        out = args.out or os.path.join(REPO, "artifacts",
                                       "semantic_ddrnet19.npz")

        def train_batch(rng):
            return s19.make_batch19(rng, args.batch, *hw,
                                    preset=s19.TRAIN_PRESET)

        def eval_batches(eval_rng):
            return s19.make_batch19(eval_rng, 8, *hw,
                                    preset=s19.EVAL_PRESET)
        eval_note = (f"DISJOINT generator family "
                     f"({s19.EVAL_PRESET.name} vs "
                     f"{s19.TRAIN_PRESET.name}): non-overlapping pitch "
                     f"{s19.EVAL_PRESET.pitch_deg} vs "
                     f"{s19.TRAIN_PRESET.pitch_deg} and camera height, "
                     f"different layout family / tint / noise / lighting")

    rng = np.random.default_rng(args.seed)
    model, params = init_segmenter(
        jax.random.PRNGKey(args.seed), height=hw[0], width=hw[1],
        num_classes=n_classes, net_width=width)
    class_weights = None
    lr = args.lr
    if args.profile == "mapillary19":
        # inverse-sqrt frequency class weights (estimated from the train
        # generator) + cosine decay — without both, sky/ground dominate
        # and the rare classes never train
        import optax
        freq = np.full(n_classes, 1e-6)
        for _ in range(30):
            _, _, lab = s19.render_scene19(rng, 120, 160,
                                           s19.TRAIN_PRESET)
            c = np.bincount(lab.ravel(), minlength=n_classes)
            freq += c / c.sum()
        wgt = 1.0 / np.sqrt(freq / freq.sum())
        class_weights = (wgt / wgt.mean()).astype(np.float32)
        lr = optax.cosine_decay_schedule(args.lr, args.steps or 900,
                                         alpha=0.02)
    opt_init, step = make_train_step(model, learning_rate=lr,
                                     class_weights=class_weights)
    opt_state = opt_init(params)

    ckpt_dir = os.path.join(os.path.dirname(out), "semantic_ckpts")
    mgr = CheckpointManager(ckpt_dir, keep=2)

    t0 = time.time()
    for i in range(steps):
        rgb, labels = train_batch(rng)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(rgb), jnp.asarray(labels))
        if i % 25 == 0:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if i % 100 == 99:
            mgr.save(i, params)   # mid-run resume point

    # held-out evaluation (mapillary19: scenes from the DISJOINT family)
    eval_rng = np.random.default_rng(10_000 + args.seed)
    rgb, labels = eval_batches(eval_rng)
    pred = np.asarray(infer_classes(model, params, jnp.asarray(rgb)))
    score = miou(pred, labels, num_classes=n_classes)
    print(f"held-out mIoU over {len(rgb)} scenes ({eval_note}): "
          f"{score:.3f}")

    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_params(out, params)
    meta = {
        "miou_heldout": round(score, 4),
        "eval_note": eval_note,
        "steps": steps, "batch": args.batch,
        "net_width": width, "num_classes": n_classes,
        "image_hw": list(hw),
        "classes": classes,
        "class_map_csv": (MAPILLARY_CSV if args.profile == "mapillary19"
                          else None),
        "train_seconds": round(time.time() - t0, 1),
    }
    with open(out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"saved {out} ({os.path.getsize(out)/1e3:.0f} kB) + metadata")
    return 0 if score >= (0.6 if args.profile == "zones4" else 0.35) else 1


if __name__ == "__main__":
    raise SystemExit(main())
