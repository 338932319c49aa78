"""End-to-end training demo on real data and real hardware: generate
exhaustive cross-correlation GT for the bundled celiu car pair, train the
canonical single-scale matcher on sampled patches, track per-epoch accuracy,
and write artifacts (learning curve, trained-flow HSV panel, checkpoint).

Run: python examples/train_car_demo.py [--epochs N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--n-train", type=int, default=2000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.data import groundtruth
    from depth_estimation_tpu.data.images import load_image, scale
    from depth_estimation_tpu.geometry import Geometry, Learning
    from depth_estimation_tpu.models import flow as flow_model
    from depth_estimation_tpu.models import io as model_io
    from depth_estimation_tpu.training import train as training
    from depth_estimation_tpu.training import score as score_mod
    from depth_estimation_tpu.utils.viz import flow2hsv, save_image

    here = os.path.dirname(os.path.abspath(__file__))

    # canonical config: 2-layer net (5x5 then 16x16), 10 features, 16 window
    g = Geometry(hImg=180, wImg=320,
                 layers=((3, 5, 5, 8), (8, 12, 12, 10)),
                 maxh=16, maxw=16, maxhGT=16, maxwGT=16,
                 hKernelGT=16, wKernelGT=16)
    lrn = Learning(rate=2e-2, rate_decay=1e-5, n_epochs=args.epochs,
                   criterion="nll", batch_size=64)

    car1 = np.asarray(scale(load_image("/root/reference/celiu/car1.jpg"),
                            g.hImg, g.wImg))
    car2 = np.asarray(scale(load_image("/root/reference/celiu/car2.jpg"),
                            g.hImg, g.wImg))

    print("generating exhaustive cross-correlation GT...", flush=True)
    fy, fx, conf = groundtruth.exhaustive_flow(g, car1, car2)
    gt = np.floor(np.stack([fy, fx]) + 0.5).astype(np.float32)
    mask = (conf > 0).astype(np.float32)
    print(f"GT confident fraction: {mask.mean():.3f}", flush=True)

    rng = np.random.RandomState(0)
    ds = training.sample_patches(g, lrn, [car1, car2], [gt * mask[None]],
                                 [mask], args.n_train, rng)
    test_ds = training.sample_patches(g, lrn, [car1, car2], [gt * mask[None]],
                                      [mask], 400, rng)
    print(f"sampled {len(ds)} train / {len(test_ds)} test patches", flush=True)

    model = flow_model.FlowModel(g)
    trainer = training.Trainer(model, lrn)
    state = trainer.init(jax.random.PRNGKey(0))

    history = []
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        state, m = trainer.epoch(state, ds, shuffle_rng=rng)
        logp = jax.vmap(lambda a, b: model.log_scores(state.params, a, b))(
            jnp.asarray(test_ds.patches1), jnp.asarray(test_ds.patches2))
        pred = np.asarray(logp.reshape(logp.shape[0], -1)).argmax(-1)
        test_acc = float((pred == test_ds.itargets).mean())
        history.append({"epoch": epoch, "train_acc": m["acc"],
                        "test_acc": test_acc, "loss": m["loss"]})
        print(f"epoch {epoch}: loss {m['loss']:.3f} train acc {m['acc']:.3f} "
              f"test acc {test_acc:.3f} ({time.perf_counter()-t0:.1f}s)",
              flush=True)

    # full-image eval of the trained model vs GT
    dist = model.scores(state.params, jnp.asarray(car1), jnp.asarray(car2))
    dec = flow_model.process_output(g, dist, process_full=True)
    s = score_mod.eval_flow(g, np.asarray(dec.full), gt)
    print(f"full-image: acc {s.accuracy:.3f} meanDst {s.mean_dst:.2f} px",
          flush=True)

    out_dir = os.path.join(here, "car_model")
    model_io.save_model(out_dir, g, lrn, state.params, history,
                        args.epochs - 1)
    save_image(os.path.join(here, "car_trained_flow_hsv.png"),
               flow2hsv(g, np.asarray(dec.full)))
    save_image(os.path.join(here, "car_gt_flow_hsv.png"), flow2hsv(g, gt))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot([h["train_acc"] for h in history], label="train acc")
        ax.plot([h["test_acc"] for h in history], label="test acc")
        ax.set_xlabel("epoch")
        ax.legend()
        fig.savefig(os.path.join(here, "car_learning_curve.png"), dpi=110)
    except ImportError:
        pass
    print("wrote examples/car_model, car_trained_flow_hsv.png, "
          "car_gt_flow_hsv.png, car_learning_curve.png", flush=True)


if __name__ == "__main__":
    main()
