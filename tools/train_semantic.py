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
    ap.add_argument("--cache", type=int, default=0,
                    help="mapillary19 only: pre-render this many train "
                    "scenes once and sample batches from the cache "
                    "(host ray-casting is the step bottleneck otherwise)")
    ap.add_argument("--aug", action="store_true",
                    help="mapillary19 only: standard train-time "
                    "augmentation (h-flip, photometric jitter, random "
                    "resized crop). Generator presets are untouched — "
                    "the train/eval family disjointness is unchanged.")
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

        def _augment_one(rng, rgb, lab):
            """Standard segmentation train-time augmentation (the kind
            any real Mapillary training run uses): horizontal flip,
            photometric jitter (gamma/contrast/tint/noise), random
            resized crop. Operates on already-rendered TRAIN-family
            scenes only — the generator presets (layout family, pitch,
            camera height) that define the train/eval disjointness are
            not touched."""
            H, W = lab.shape
            if rng.random() < 0.5:            # h-flip (also removes any
                rgb = rgb[:, ::-1]            # lighting-direction latch)
                lab = lab[:, ::-1]
            if rng.random() < 0.8:            # random resized crop
                s = rng.uniform(0.55, 1.0)
                ch, cw = max(int(H * s), 8), max(int(W * s), 8)
                y0 = rng.integers(0, H - ch + 1)
                x0 = rng.integers(0, W - cw + 1)
                yy = np.clip((np.arange(H) + 0.5) * ch / H - 0.5,
                             0, ch - 1).round().astype(int) + y0
                xx = np.clip((np.arange(W) + 0.5) * cw / W - 0.5,
                             0, cw - 1).round().astype(int) + x0
                rgb = rgb[yy][:, xx]
                lab = lab[yy][:, xx]
            rgb = np.clip(rgb, 1e-4, 1.0) ** np.exp(rng.uniform(-.3, .3))
            rgb = (rgb - 0.5) * rng.uniform(0.8, 1.25) + 0.5
            rgb = rgb + rng.uniform(-0.10, 0.10, 3).astype(np.float32)
            rgb = rgb + rng.normal(0.0, rng.uniform(0.0, 0.05),
                                   rgb.shape).astype(np.float32)
            return np.clip(rgb, 0, 1).astype(np.float32), lab

        cache_scenes = None
        if args.cache:
            print(f"pre-rendering {args.cache} train-family scenes...",
                  flush=True)
            t_c = time.time()
            c_rng = np.random.default_rng(args.seed + 777)
            cache_scenes = [
                (lambda o: (o[0], o[2]))(
                    s19.render_scene19(c_rng, *hw, s19.TRAIN_PRESET))
                for _ in range(args.cache)]
            print(f"cache built in {time.time()-t_c:.0f}s", flush=True)

        def train_batch(rng):
            if cache_scenes is not None:
                idx = rng.choice(len(cache_scenes), args.batch,
                                 replace=False)
                pairs = [cache_scenes[i] for i in idx]
            else:
                pairs = [
                    (lambda o: (o[0], o[2]))(
                        s19.render_scene19(rng, *hw, s19.TRAIN_PRESET))
                    for _ in range(args.batch)]
            if args.aug:
                pairs = [_augment_one(rng, r, l) for r, l in pairs]
            rgbs, labs = zip(*pairs)
            return np.stack(rgbs), np.stack(labs)

        def eval_batches(eval_rng):
            # 32 scenes: the headline mIoU should be a population
            # statistic, not an 8-scene draw
            return s19.make_batch19(eval_rng, 32, *hw,
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
        # ship images bf16 (the net casts to bf16 at entry anyway) —
        # halves host->device transfer, which dominates the step wall
        # time on remote-attached devices
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(rgb, jnp.bfloat16),
                                       jnp.asarray(labels))
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
