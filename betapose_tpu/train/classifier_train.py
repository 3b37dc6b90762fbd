"""Classifier training — counterpart of darknet's `classifier train` path
(`train_YOLO/src/classifier.c:44-187`) on the TPU stack.

darknet semantics pinned here (reference file:line):

- truth labels (`data.c:448 fill_truth`): a label string matches an image
  by SUBSTRING of the image path; zero or multiple matches print a
  warning ("Too many or too few labels").
- augmentation (`data.c:1021 load_data_augment` -> `image.c:1454
  random_augment_image` -> `image.c:1402 rotate_crop_image`): aspect ~
  rand_scale(aspect); target short side r ~ rand_int(min_crop, max_crop)
  inclusive; scale = r / min(h, trunc(w*aspect)); offsets dx,dy ~
  U(-o, o) with o = max(0, (scaled_dim - size)/2); then a size x size
  bilinear crop about the image center (zero outside the source, matching
  `get_pixel_extend` = 0), flip p=.5 when net flip=1, HSV distort.
  The rotation branch (net `angle`, default 0 per `parser.c:640`) is not
  implemented — a nonzero angle warns and proceeds with angle=0
  (documented deviation; a rotation is not an axis-aligned separable
  resample).
- loss (`softmax_layer.c:63` + `cost_layer.c:73-95` + `blas.c l2_cpu`):
  the [cost sse] layer reports sum((t - p)^2) but its backward delta is
  (t - p) — no factor 2 — and `backward_softmax_layer` adds the delta
  straight through with NO softmax Jacobian.  Net effect: the logit
  gradient is scale*(p - t) (softmax-cross-entropy's gradient for one-hot
  t) while the printed loss is SSE.  Reproduced exactly with a custom-vjp
  pair: `models.yolov3._darknet_softmax` (identity backward) + `sse_cost`
  below (delta transcription backward).
- printed loss = cost_sum / batch (`network.c train_network` returns
  sum/(n*batch)); darknet's update uses lr/batch scaling of accumulated
  deltas, which the 1/batch loss normalization folds into the gradient.
- LR policy (`network.c:78-140 get_current_rate`): the full table —
  constant / steps (with burn-in ^4 ramp) / step / exp / poly
  ((1 - i/max)^power) / sigmoid / random — classifier cfgs ship
  policy=poly power=4.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.train import yolo_train


@dataclasses.dataclass
class ClassifierTrainConfig:
    lr: float = 0.1
    momentum: float = 0.9
    decay: float = 5e-4
    max_batches: int = 0
    policy: str = "constant"
    power: float = 4.0
    steps: tuple = ()
    scales: tuple = ()
    gamma: float = 1.0          # exp/sigmoid policies (parser.c:683-687)
    step: int = 1               # step/sigmoid policies (singular key)
    scale: float = 1.0          # step policy
    burn_in: int = 0
    # augmentation ([net] block, parser.c:629-646 defaults)
    min_crop: int = 0           # default net.w  (parser.c:636)
    max_crop: int = 0           # default 2*net.w (parser.c:635)
    flip: bool = True
    angle: float = 0.0
    aspect: float = 1.0
    hue: float = 0.0
    saturation: float = 1.0
    exposure: float = 1.0


def net_cfg_to_config(spec) -> ClassifierTrainConfig:
    net = spec.net_info
    get = lambda k, d: type(d)(net.get(k, d))
    w = int(net.get("width", 224))
    steps = tuple(int(s) for s in str(net.get("steps", "")).split(",") if s)
    scales = tuple(
        float(s) for s in str(net.get("scales", "")).split(",") if s)
    return ClassifierTrainConfig(
        lr=get("learning_rate", 0.1),
        momentum=get("momentum", 0.9),
        decay=get("decay", 5e-4),
        max_batches=get("max_batches", 0),
        policy=str(net.get("policy", "constant")),
        power=get("power", 4.0),
        steps=steps, scales=scales,
        gamma=get("gamma", 1.0),
        step=get("step", 1),
        scale=get("scale", 1.0),
        burn_in=get("burn_in", 0),
        min_crop=int(net.get("min_crop", w)),
        max_crop=int(net.get("max_crop", 2 * w)),
        flip=bool(int(net.get("flip", 1))),
        angle=get("angle", 0.0),
        aspect=get("aspect", 1.0),
        hue=get("hue", 0.0),
        saturation=get("saturation", 1.0),
        exposure=get("exposure", 1.0),
    )


def lr_schedule(cfg: ClassifierTrainConfig):
    """network.c get_current_rate — the full policy table (`network.c:
    88-120`), cfg strings per get_policy (`parser.c:599-610`: 'sigmoid',
    not 'sig').  Unknown policies fall back to constant like darknet."""
    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        base = jnp.asarray(cfg.lr, jnp.float32)
        if cfg.policy == "poly":
            frac = jnp.clip(step / max(cfg.max_batches, 1), 0.0, 1.0)
            rate = base * jnp.power(1.0 - frac, cfg.power)
        elif cfg.policy == "steps":
            rate = base
            for s, sc in zip(cfg.steps, cfg.scales):
                rate = jnp.where(step > s, rate * sc, rate)
        elif cfg.policy == "step":
            # C int division: lr * scale^(batch_num / step)
            rate = base * jnp.power(
                cfg.scale, jnp.floor(step / max(cfg.step, 1)))
        elif cfg.policy == "exp":
            rate = base * jnp.power(cfg.gamma, step)
        elif cfg.policy == "sigmoid":
            rate = base / (1.0 + jnp.exp(cfg.gamma * (step - cfg.step)))
        elif cfg.policy == "random":
            # darknet: lr * rand_uniform(0,1)^power; counter-based PRNG
            # keyed on the iteration is the deterministic JAX equivalent
            u = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0),
                                   step.astype(jnp.int32)))
            rate = base * jnp.power(u, cfg.power)
        else:  # constant (and darknet's unknown-policy fallback)
            rate = base
        if cfg.burn_in:
            ramp = base * jnp.power(step / cfg.burn_in, cfg.power)
            rate = jnp.where(step < cfg.burn_in, ramp, rate)
        return rate
    return lr


def make_optimizer(cfg: ClassifierTrainConfig):
    """Same masked SGD-momentum chain as the detector trainer (darknet has
    one update rule for all nets, convolutional_layer.c update)."""
    sched = lr_schedule(cfg)
    tx = optax.chain(
        optax.masked(optax.add_decayed_weights(cfg.decay),
                     yolo_train._decay_mask),
        optax.sgd(learning_rate=sched, momentum=cfg.momentum),
    )
    return optax.masked(tx, yolo_train._trainable_mask)


# ---------------------------------------------------------------------------
# Labels (fill_truth)
# ---------------------------------------------------------------------------

def load_labels(label_list_path):
    """get_labels (data.c): one label string per line."""
    return [ln.strip() for ln in open(label_list_path) if ln.strip()]


def paths_to_truth(paths, labels):
    """fill_truth (data.c:448): truth[j] = 1 where labels[j] is a substring
    of the path; warns on zero/multiple matches like darknet does."""
    truth = np.zeros((len(paths), len(labels)), np.float32)
    for i, p in enumerate(paths):
        hits = [j for j, lab in enumerate(labels) if lab in p]
        for j in hits:
            truth[i, j] = 1.0
        if len(hits) != 1:
            print(f"Too many or too few labels: {len(hits)}, {p}")
    return truth


def path_class_id(path, labels):
    """validate_classifier_single's class lookup (classifier.c:535-543):
    FIRST label that substring-matches, else -1."""
    for j, lab in enumerate(labels):
        if lab in path:
            return j
    return -1


# ---------------------------------------------------------------------------
# Augmentation (random_augment_image, angle=0 path)
# ---------------------------------------------------------------------------

def scale_crop(img, scale, aspect, dx, dy, size):
    """rotate_crop_image with rad=0 (image.c:1402): output pixel (x, y)
    samples source ((x - size/2 + dx)*aspect/scale + w/2,
    (y - size/2 + dy)/scale + h/2) bilinearly, zero outside — expressed as
    two separable matmuls (axis-aligned resample; TPU gathers are slow).
    scale/aspect/dx/dy may be traced scalars."""
    h, w, _ = img.shape
    ys = (jnp.arange(size, dtype=jnp.float32) - size / 2.0 + dy) / scale \
        + h / 2.0
    xs = (jnp.arange(size, dtype=jnp.float32) - size / 2.0 + dx) \
        * aspect / scale + w / 2.0
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    wy = jnp.clip(1.0 - jnp.abs(ys[:, None] - rows[None, :]), 0.0)
    wx = jnp.clip(1.0 - jnp.abs(xs[:, None] - cols[None, :]), 0.0)
    with jax.default_matmul_precision("float32"):
        tmp = jnp.einsum("ih,hwc->iwc", wy, img)
        return jnp.einsum("jw,iwc->ijc", wx, tmp)


def _rand_scale(ka, kb, s):
    """utils.c rand_scale: U(1, s), inverted with p=.5."""
    v = jax.random.uniform(ka, minval=1.0, maxval=s)
    return jnp.where(jax.random.uniform(kb) > 0.5, 1.0 / v, v)


_AUG_CACHE = {}


def augment_classification_batch(key, imgs, cfg: ClassifierTrainConfig,
                                 size: int):
    """imgs [B,H,W,3] float [0,1] -> [B,size,size,3]; the full
    random_augment_image + flip + distort chain, jit-cached per shape."""
    sig = ("cls", cfg.min_crop, cfg.max_crop, cfg.flip, cfg.aspect,
           cfg.hue, cfg.saturation, cfg.exposure, size, imgs.shape[1:])
    fn = _AUG_CACHE.get(sig)
    if fn is None:
        def batch_fn(key, imgs):
            def one(k, img):
                h, w, _ = img.shape
                k1, k2, k3, k4, k5, k6, k7 = jax.random.split(k, 7)
                aspect = (_rand_scale(k1, k2, cfg.aspect)
                          if cfg.aspect != 1.0
                          else jnp.float32(1.0))
                # rand_int inclusive (utils.c); min side uses the C int
                # truncation of w*aspect (image.c:1456-1458)
                r = jax.random.randint(
                    k3, (), cfg.min_crop, cfg.max_crop + 1).astype(
                        jnp.float32)
                min_side = jnp.where(
                    h < w * aspect, jnp.float32(h),
                    jnp.trunc(w * aspect))
                scale = r / min_side
                ox = jnp.maximum(0.0, (w * scale / aspect - size) / 2.0)
                oy = jnp.maximum(0.0, (h * scale - size) / 2.0)
                dx = jax.random.uniform(k4, minval=-ox, maxval=ox)
                dy = jax.random.uniform(k5, minval=-oy, maxval=oy)
                out = scale_crop(img, scale, aspect, dx, dy, size)
                if cfg.flip:
                    out = jnp.where(jax.random.uniform(k6) < 0.5,
                                    out[:, ::-1, :], out)
                if cfg.hue or cfg.saturation != 1.0 or cfg.exposure != 1.0:
                    out = yolo_train.distort_hsv(
                        k7, out, cfg.hue, cfg.saturation, cfg.exposure)
                return out

            return jax.vmap(one)(jax.random.split(key, imgs.shape[0]), imgs)

        fn = jax.jit(batch_fn)
        _AUG_CACHE[sig] = fn
    return fn(key, imgs)


# ---------------------------------------------------------------------------
# Loss ([softmax] + [cost])
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def darknet_cost(pred, truth, cost_type: str, scale: float):
    """cost_layer.c forward/backward, batch-normalized: value is
    sum(error)/B; backward is darknet's delta (NOT the analytic gradient of
    the value): l2_cpu delta = (t - p) with no factor 2; smooth_l1_cpu's
    linear-branch delta sign is inverted in darknet (blas.c: delta = +1
    when diff < 0) — transcribed faithfully, quirk and all.  `scale`
    multiplies only the delta (backward_cost_layer axpy), never the
    reported cost."""
    b = pred.shape[0]
    diff = truth - pred
    if cost_type == "smooth":
        err = jnp.where(jnp.abs(diff) < 1.0, diff * diff,
                        2.0 * jnp.abs(diff) - 1.0)
    else:  # sse (masked's SECRET_NUM protocol is out of scope)
        err = diff * diff
    return jnp.sum(err) / b


def _cost_fwd(pred, truth, cost_type, scale):
    return darknet_cost(pred, truth, cost_type, scale), (pred, truth)


def _cost_bwd(cost_type, scale, res, g):
    pred, truth = res
    b = pred.shape[0]
    diff = truth - pred
    if cost_type == "smooth":
        delta = jnp.where(jnp.abs(diff) < 1.0, diff,
                          jnp.where(diff < 0, 1.0, -1.0))
    else:
        delta = diff
    # minimization convention: gradient = -delta (darknet ascends on delta)
    return (g * scale * (-delta) / b, None)


darknet_cost.defvjp(_cost_fwd, _cost_bwd)


def classifier_loss(spec, params, images, truth, bn_stats=None,
                    dropout_key=None):
    """Forward + darknet cost.  truth [B, classes] (fill_truth one-hots).
    Returns (loss, metrics).  The forward's [softmax] uses the
    pass-through-backward _darknet_softmax, so grad(loss) reproduces
    darknet's logit delta scale*(p - t)."""
    cost_layers = [l for l in spec.layers if l.kind == "cost"]
    if not cost_layers:
        raise ValueError(
            "classifier training needs a [cost] layer: without one darknet "
            "never fills any delta (cost_layer.c is the only truth-driven "
            "backward source for classifier cfgs)")
    cl = cost_layers[-1]
    reso = images.shape[2]
    pred = yolo_mod.forward(spec, params, images, reso, decode=True,
                            train=True, bn_stats=bn_stats,
                            dropout_key=dropout_key)
    pred = pred.reshape(pred.shape[0], -1).astype(jnp.float32)
    loss = darknet_cost(pred, truth, cl.cost_type, cl.cost_scale)
    acc = jnp.mean((jnp.argmax(pred, -1) == jnp.argmax(truth, -1))
                   .astype(jnp.float32))
    return loss, {"acc": acc}


def make_train_step(spec, tx, donate: bool = False):
    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, images, truth, dropout_key=None):
        def loss_fn(p):
            bn_stats = {}
            with jax.default_matmul_precision("float32"):
                loss, metrics = classifier_loss(
                    spec, p, images, truth, bn_stats=bn_stats,
                    dropout_key=dropout_key)
            return loss, (metrics, bn_stats)

        (loss, (metrics, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = yolo_mod.apply_bn_updates(
            params, jax.tree_util.tree_map(jax.lax.stop_gradient, bn_stats))
        metrics = dict(metrics)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# Train driver (train_classifier, classifier.c:44-187)
# ---------------------------------------------------------------------------

def train_from_data_cfg(data_path, cfg_path, weights_path=None,
                        clear=False, n_devices=None, batch=None,
                        snapshot_every=100, max_batches=None):
    import os
    import time
    from betapose_tpu.tools.darknet_cli import read_data_cfg
    from betapose_tpu.data.loader import imread_rgb
    from betapose_tpu.parallel import mesh as mesh_mod

    opts = read_data_cfg(data_path)
    backup = opts.get("backup", "backup")
    os.makedirs(backup, exist_ok=True)
    with open(cfg_path) as f:
        spec = yolo_mod.build_spec(f.read())
    tcfg = net_cfg_to_config(spec)
    if max_batches is not None:
        tcfg.max_batches = max_batches
    if tcfg.angle:
        print(f"WARNING: net angle={tcfg.angle} ignored "
              "(rotation augmentation not implemented; see PARITY.md)")
    net = spec.net_info
    size = int(net.get("width", 224))
    global_batch = batch or int(net.get("batch", 64))
    base_name = os.path.splitext(os.path.basename(cfg_path))[0]

    labels = load_labels(opts.get("labels", opts.get("names", "")))
    paths = [ln.strip() for ln in open(opts["train"]) if ln.strip()]
    truth_all = paths_to_truth(paths, labels)
    n_img = len(paths)
    print(f"{n_img} training images, {len(labels)} classes")

    seen = 0
    if weights_path and os.path.exists(weights_path):
        params, header = yolo_mod.load_darknet_weights(spec, weights_path)
        seen = 0 if clear else int(header[3])
        print(f"Resuming from {weights_path} (seen={seen})")
    else:
        params = yolo_mod.init_params(jax.random.PRNGKey(0), spec)

    tx = make_optimizer(tcfg)
    opt_state = tx.init(params)
    opt_state = yolo_train.fast_forward_opt_state(
        opt_state, seen // global_batch)
    mesh = mesh_mod.make_mesh(n_devices)
    params = mesh_mod.replicate(mesh, params)
    opt_state = mesh_mod.replicate(mesh, opt_state)
    step_fn = make_train_step(spec, tx)
    has_dropout = any(l.kind == "dropout" for l in spec.layers)

    import concurrent.futures as cf
    pool = cf.ThreadPoolExecutor(8)
    src_shape = None

    def load_one(p):
        nonlocal src_shape
        im = imread_rgb(p).astype(np.float32) / 255.0
        if src_shape is None:
            src_shape = im.shape
        elif im.shape != src_shape:
            # static-shape canvas: darknet crops from the true original;
            # mixed-size datasets are pre-resized to the first image's
            # shape here (uniform-size sets — LineMod — are identical)
            import cv2
            im = cv2.resize(im, (src_shape[1], src_shape[0]))
        return im

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    avg_loss = -1.0
    start_iter = seen // global_batch
    lr_fn = lr_schedule(tcfg)
    for it in range(start_iter, tcfg.max_batches):
        idxs = rng.integers(0, n_img, global_batch)
        imgs_host = np.stack(list(pool.map(
            lambda i: load_one(paths[i]), idxs)))
        truth_host = truth_all[idxs]
        key, k_aug, k_drop = jax.random.split(key, 3)
        batch_dev = mesh_mod.shard_batch(mesh, {
            "imgs": imgs_host, "truth": truth_host})
        aug = augment_classification_batch(
            k_aug, batch_dev["imgs"], tcfg, size)
        t0 = time.time()
        params, opt_state, m = step_fn(
            params, opt_state, aug, batch_dev["truth"],
            dropout_key=(k_drop if has_dropout else None))
        loss = float(m["loss"])
        avg_loss = loss if avg_loss < 0 else avg_loss * 0.9 + loss * 0.1
        n_seen = (it + 1) * global_batch
        # classifier.c:153 print format
        print(f"{it + 1}, {n_seen / n_img:.3f}: {loss:f}, {avg_loss:f} avg,"
              f" {float(lr_fn(it + 1)):f} rate, {time.time() - t0:f} "
              f"seconds, {n_seen} images")
        if snapshot_every and (it + 1) % snapshot_every == 0:
            out = os.path.join(backup, f"{base_name}_{it + 1}.weights")
            yolo_mod.save_darknet_weights(
                spec, jax.device_get(params), out, seen=n_seen)
            print(f"Saving weights to {out}")
    out = os.path.join(backup, f"{base_name}_final.weights")
    yolo_mod.save_darknet_weights(
        spec, jax.device_get(params), out,
        seen=tcfg.max_batches * global_batch)
    print(f"Saving weights to {out}")
    return params
