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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "semantic_ddrnet.npz"))
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from dddmr_navigation_tpu.perception.semantic import (
        init_segmenter, make_train_step, infer_classes, save_params)
    from dddmr_navigation_tpu.perception.semantic_data import (
        CameraIntrinsics, make_batch, miou)
    from dddmr_navigation_tpu.runtime.checkpoint import CheckpointManager

    cam = CameraIntrinsics()
    rng = np.random.default_rng(args.seed)
    model, params = init_segmenter(
        jax.random.PRNGKey(args.seed), height=cam.height, width=cam.width,
        num_classes=4, net_width=args.width)
    opt_init, step = make_train_step(model, learning_rate=args.lr)
    opt_state = opt_init(params)

    ckpt_dir = os.path.join(os.path.dirname(args.out), "semantic_ckpts")
    mgr = CheckpointManager(ckpt_dir, keep=2)

    t0 = time.time()
    for i in range(args.steps):
        rgb, labels = make_batch(rng, args.batch, cam)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(rgb), jnp.asarray(labels))
        if i % 25 == 0:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if i % 100 == 99:
            mgr.save(i, params)   # mid-run resume point

    # held-out evaluation
    eval_rng = np.random.default_rng(10_000 + args.seed)
    rgb, labels = make_batch(eval_rng, 8, cam)
    pred = np.asarray(infer_classes(model, params, jnp.asarray(rgb)))
    score = miou(pred, labels, num_classes=4)
    print(f"held-out mIoU over 8 scenes: {score:.3f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(args.out, params)
    meta = {
        "miou_heldout": round(score, 4),
        "steps": args.steps, "batch": args.batch,
        "net_width": args.width, "num_classes": 4,
        "image_hw": [cam.height, cam.width],
        "classes": ["background", "floor", "forbidden_zone", "obstacle"],
        "train_seconds": round(time.time() - t0, 1),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"saved {args.out} ({os.path.getsize(args.out)/1e3:.0f} kB) "
          f"+ metadata")
    return 0 if score >= 0.6 else 1


if __name__ == "__main__":
    raise SystemExit(main())
