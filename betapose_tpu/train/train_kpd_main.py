"""KPD training CLI.

Counterpart of `train_KPD/src/train.py` with the same flag surface
(`--expID --nClasses --optMethod --trainBatch --addDPG --loadModel
--nEpochs --snapshot ...`, README.md:62-69) on the TPU stack:
host decodes PNGs, augmentation runs batched on device
(`train/augment.py`), the train step is jit'd with DP sharding over the
mesh, checkpoints are .npz pytrees + a torch-compatible option dump.

Observability parity (SURVEY.md 5.5): per-iteration Train/Loss and
Train/Acc scalars (tensorboardX if importable, else a metrics.jsonl file),
stdout epoch summaries, valid every `snapshot` epochs with flip-TTA.

Example:
  python -m betapose_tpu.train.train_kpd_main --expID seq1 --nClasses 50 \
      --optMethod adam --trainBatch 28 --annot_dir ./data/01 \
      --img_dir ./data/01
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.core.config import make_parser
from betapose_tpu.core import checkpoint as ckpt
from betapose_tpu.models import kpd as kpd_mod
from betapose_tpu.train import kpd_train
from betapose_tpu.train.augment import AugmentConfig, augment_batch
from betapose_tpu.data.annot import KPDTrainDataset
from betapose_tpu.parallel import mesh as mesh_mod


class MetricsLogger:
    """tensorboardX if available, always a metrics.jsonl."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self.f = open(self.path, "a")
        self.tb = None
        try:
            from tensorboardX import SummaryWriter
            self.tb = SummaryWriter(logdir)
        except Exception:
            pass

    def scalar(self, tag, value, step):
        self.f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self.tb is not None:
            self.tb.add_scalar(tag, float(value), step)

    def flush(self):
        self.f.flush()


def add_train_args(parser):
    parser.add_argument("--annot_dir", default="./data/05", type=str,
                        help="directory holding annot_{train,eval}.h5")
    parser.add_argument("--img_dir", default=None, type=str,
                        help="image root (default: annot_dir)")
    parser.add_argument("--valid_every", default=5, type=int)
    parser.add_argument("--n_devices", default=None, type=int)
    parser.add_argument("--exp_root", default="exp", type=str)
    parser.add_argument("--tb_root", default="tensorboard", type=str)
    parser.add_argument("--trainPrecision", default=None, type=str,
                        choices=["bfloat16", "tensorfloat32", "float32"],
                        help="MXU mode for train-step convs (default: "
                        "kpd_train.DEFAULT_TRAIN_PRECISION); activations/"
                        "BN/loss/optimizer stay f32 in every mode")
    parser.add_argument("--symPerms", default=None, type=str,
                        help="symmetric-object training: .npy [M,K] (or "
                        "text, one comma-separated row per symmetry "
                        "element) of keypoint-channel permutations; the "
                        "loss becomes per-sample min over symmetry modes "
                        "(kpd_train.make_loss_fn sym_perms).  Derive from "
                        "a keypoint model + symmetry rotation with "
                        "tools.objects.symmetry_keypoint_perms")
    return parser


def load_sym_perms(path, n_classes):
    """Load channel permutations for the symmetry-aware loss: .npy [M,K]
    or text rows of comma-separated ints.  Each row must be a permutation
    of range(n_classes)."""
    if path.endswith(".npy"):
        arr = np.load(path)
        rows = np.atleast_2d(np.asarray(arr, np.int64))
    else:
        with open(path) as f:
            rows = np.asarray(
                [[int(v) for v in line.replace(",", " ").split()]
                 for line in f if line.strip()], np.int64)
    perms = []
    for row in rows:
        if sorted(row.tolist()) != list(range(n_classes)):
            raise ValueError(
                f"--symPerms row {row.tolist()} is not a permutation of "
                f"range({n_classes})")
        perms.append(row.astype(np.int32))
    return tuple(perms)


def main(argv=None):
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = add_train_args(make_parser("Betapose-TPU KPD training"))
    args = parser.parse_args(argv)

    # ---- arch dispatch first: fail fast before any dataset IO ----
    n_kp = args.nClasses
    arch = args.netType
    if arch == "hgPRM":
        # PyraNet stacked hourglass (reference opt.py --netType hgPRM):
        # intermediate supervision — the loss sums over all nStack heads
        # (train=True returns all heads; eval uses the final head).
        from betapose_tpu.models import hgprm
        params = hgprm.init_params(
            jax.random.PRNGKey(0), n_classes=n_kp, n_feats=args.nFeats,
            n_stack=args.nStack, base_width=args.baseWidth,
            cardinality=args.cardinality)

        def forward_fn(p, x, train=False, bn_stats=None):
            return hgprm.forward(p, x, all_heads=train, train=train,
                                 bn_stats=bn_stats)

        def prepare_infer(p, batch_inps):
            # hgPRM trains with batch-stat BN and does NOT roll running
            # stats — calibrate them on a representative batch before any
            # inference-mode use (validation, checkpoints); without this
            # the running stats stay at init identity and eval activations
            # are unnormalized (hgprm.forward docstring)
            return hgprm.calibrate_bn(p, batch_inps)

        def load_params(path):
            # hgPRM has no torch checkpoint contract (the reference fork
            # never trained it); our own .npz pytrees only.
            return ckpt.load_pytree_npz(path, params)
    elif arch in ("resnet50", "resnet101"):
        params = kpd_mod.init_params(jax.random.PRNGKey(0), n_classes=n_kp,
                                     arch=arch)
        forward_fn = None
        prepare_infer = None  # FastPose rolls BN stats during training

        def load_params(path):
            return ckpt.load_kpd_checkpoint(path, n_kp, arch)
    else:
        raise ValueError(
            f"unsupported --netType {arch!r}: expected resnet50, resnet101,"
            " or hgPRM")

    exp_dir = os.path.join(args.exp_root, args.dataset, args.expID)
    os.makedirs(exp_dir, exist_ok=True)
    log = MetricsLogger(os.path.join(args.tb_root, args.dataset, args.expID))

    img_dir = args.img_dir or args.annot_dir
    train_ds = KPDTrainDataset(
        os.path.join(args.annot_dir, "annot_train.h5"),
        os.path.join(img_dir, "train"), args.trainBatch, shuffle=True)
    try:
        valid_ds = KPDTrainDataset(
            os.path.join(args.annot_dir, "annot_eval.h5"),
            os.path.join(img_dir, "eval"), args.validBatch, shuffle=False)
    except Exception:
        valid_ds = None

    start_epoch = args.epoch
    if args.loadModel:
        params = load_params(args.loadModel)
        print(f"Loading model from {args.loadModel}")

    tx = kpd_train.make_optimizer(args.optMethod, args.LR, args.momentum,
                                  args.weightDecay, params_example=params)
    opt_state = tx.init(params)
    # --Continue resumes model + optimizer state from the experiment dir
    # (reference train.py:114-116 / optimizer.pkl snapshots)
    opt_ckpt = os.path.join(exp_dir, "optimizer.npz")
    if args.Continue and os.path.exists(opt_ckpt):
        opt_state = ckpt.load_pytree_npz(opt_ckpt, opt_state)
        latest = sorted(
            (f for f in os.listdir(exp_dir)
             if f.startswith("model_") and f.endswith(".npz")
             and f.split("_")[1].split(".")[0].isdigit()),
            key=lambda f: int(f.split("_")[1].split(".")[0]))
        if latest:
            params = load_params(os.path.join(exp_dir, latest[-1]))
            start_epoch = int(latest[-1].split("_")[1].split(".")[0]) + 1
            print(f"Continuing from epoch {start_epoch}")
    precision = (args.trainPrecision
                 or kpd_train.DEFAULT_TRAIN_PRECISION)
    sym_perms = (load_sym_perms(args.symPerms, args.nClasses)
                 if args.symPerms else None)
    train_step = kpd_train.make_train_step(tx, out_res_h=args.outputResH,
                                           forward_fn=forward_fn,
                                           matmul_precision=precision,
                                           sym_perms=sym_perms)
    eval_step = kpd_train.make_eval_step(out_res_h=args.outputResH,
                                         forward_fn=forward_fn,
                                         sym_perms=sym_perms)

    mesh = mesh_mod.make_mesh(args.n_devices)
    params = mesh_mod.replicate(mesh, params)
    opt_state = mesh_mod.replicate(mesh, opt_state)

    aug_cfg = AugmentConfig(
        inp_h=args.inputResH, inp_w=args.inputResW,
        out_h=args.outputResH, out_w=args.outputResW,
        scale_min=0.2, scale_max=0.3, rotate=args.rotate,
        hm_gauss=args.hmGauss, add_dpg=bool(args.addDPG), train=True)
    key = jax.random.PRNGKey(42)

    best_epoch, best_acc = 0, -1.0
    it = args.trainIters
    last_batch = None
    for epoch in range(start_epoch, args.nEpochs):
        t0 = time.time()
        ep_loss, ep_acc, n_it = 0.0, 0.0, 0
        for batch_host in train_ds.epoch():
            key, k1 = jax.random.split(key)
            batch_dev = mesh_mod.shard_batch(mesh, {
                "imgs": batch_host["imgs"],
                "bndbox": batch_host["bndbox"],
                "part": batch_host["part"]})
            batch = augment_batch(k1, batch_dev["imgs"], batch_dev["bndbox"],
                                  batch_dev["part"], aug_cfg)
            params, opt_state, m = train_step(params, opt_state, batch)
            it += 1
            n_it += 1
            loss, acc = float(m["loss"]), float(m["acc"])
            ep_loss += loss
            ep_acc += acc
            log.scalar("Train/Loss", loss, it)
            log.scalar("Train/Acc", acc, it)
        ep_loss /= max(n_it, 1)
        ep_acc /= max(n_it, 1)
        print(f"Epoch {epoch} | loss {ep_loss:.6f} | acc {ep_acc:.4f} "
              f"| {time.time() - t0:.1f}s")
        log.flush()

        # inference-ready params for validation + checkpoints (hgPRM needs
        # post-hoc BN calibration on a representative batch — an eager full
        # forward pass, so compute it only on epochs that consume it;
        # FastPose's rolling stats are already inference-ready)
        do_valid = valid_ds is not None and epoch % args.valid_every == 0
        do_snap = bool(args.snapshot) and epoch % args.snapshot == 0
        if n_it > 0:
            last_batch = batch
        infer_params = params
        if prepare_infer is not None and (do_valid or do_snap) \
                and last_batch is not None:
            infer_params = prepare_infer(params, last_batch["inps"])

        if do_valid:
            v_loss, v_acc, nv = 0.0, 0.0, 0
            vcfg = AugmentConfig(
                inp_h=args.inputResH, inp_w=args.inputResW,
                out_h=args.outputResH, out_w=args.outputResW, train=False)
            for batch_host in valid_ds.epoch():
                key, k1 = jax.random.split(key)
                batch = augment_batch(
                    k1, jnp.asarray(batch_host["imgs"]),
                    jnp.asarray(batch_host["bndbox"]),
                    jnp.asarray(batch_host["part"]), vcfg)
                m = eval_step(infer_params, batch)
                v_loss += float(m["loss"])
                v_acc += float(m["acc"])
                nv += 1
            v_loss /= max(nv, 1)
            v_acc /= max(nv, 1)
            print(f"Valid epoch {epoch} | loss {v_loss:.6f} | acc {v_acc:.4f}")
            log.scalar("Valid/Loss", v_loss, epoch)
            log.scalar("Valid/Acc", v_acc, epoch)
            if v_acc > best_acc:
                best_acc, best_epoch = v_acc, epoch

        if do_snap:
            ckpt.save_pytree_npz(
                os.path.join(exp_dir, f"model_{epoch}.npz"),
                jax.device_get(infer_params))
            ckpt.save_pytree_npz(os.path.join(exp_dir, "optimizer.npz"),
                                 jax.device_get(opt_state))
            with open(os.path.join(exp_dir, "option.json"), "w") as f:
                json.dump(vars(args), f, default=str)
    print(f"Best epoch: {best_epoch}, acc {best_acc:.4f}")
    final_params = params
    if prepare_infer is not None and last_batch is not None:
        final_params = prepare_infer(params, last_batch["inps"])
    ckpt.save_pytree_npz(os.path.join(exp_dir, "model_final.npz"),
                         jax.device_get(final_params))
    return final_params


if __name__ == "__main__":
    main()
