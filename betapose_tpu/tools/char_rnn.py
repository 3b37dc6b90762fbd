"""Char-RNN task family — the `darknet rnn` verbs (`rnn.c:129-493`,
dispatched from `darknet.c:351`) on the TPU stack.

Three live verbs (run_char_rnn, rnn.c:469):

- ``train``:    train_char_rnn (rnn.c:129-215) — raw-byte (or tokenized)
  stream batches, `streams = batch/time_steps` parallel read heads with
  random offsets, one-hot x/y pairs in darknet's step-major layout,
  SGD + the [net] LR policy, the 1-in-10 per-stream offset reset,
  snapshots every 1000 iters + rolling .backup every 10.
- ``generate``: test_char_rnn (rnn.c:226-281) — seed priming, then
  autoregressive sampling at temperature with the `out < 1e-4 -> 0`
  pruning and sample_array's proportional draw.  TPU-native: the whole
  generation is ONE `lax.scan` carrying every recurrent layer's state
  (darknet leans on persistent l.state across single-char
  network_predict calls; a functional graph threads the state
  explicitly instead).
- ``valid``:    valid_char_rnn (rnn.c:377-421) — per-character log2
  likelihood of a held-out stream after seed priming; prints the final
  character/word perplexities (darknet prints a running line per char;
  the final line carries the same numbers).

Documented deviations:
- Training state is NOT carried across optimizer steps: each step runs
  the scan from zero state (plain truncated BPTT).  darknet persists
  l.state across train_network_datum calls and resets each stream with
  p=0.1 (reset_rnn_state, rnn.c:115-127); the offset-reset part of that
  rule IS transcribed.  Carrying state across jit boundaries would make
  every layer's hidden state a train-step argument for a continuity
  darknet itself randomly destroys.
- Recurrent sublayers with batch_normalize=1 refuse to train (per-step
  batch-stat BN inside the scan is not plumbed; `models/yolov3.forward`
  documents the same limit).  BN-free cfgs train with exact semantics.
- validtactic / generatetactic / vec (Go-tactics data formats,
  rnn.c:283-375,423-467) are out of scope with the go.c family.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.train import yolo_train
from betapose_tpu.train.classifier_train import (
    net_cfg_to_config, make_optimizer, darknet_cost)


# ---------------------------------------------------------------------------
# Data path (rnn.c:16-113)
# ---------------------------------------------------------------------------

def read_tokenized_data(path):
    """read_tokenized_data (rnn.c:16-36): whitespace-separated ints."""
    return np.array(open(path).read().split(), np.int64)


def read_tokens(path):
    """read_tokens (rnn.c:38-57): one symbol string per line."""
    return [ln.rstrip("\n") for ln in open(path)]


def get_rnn_batch(stream, offsets, n_inputs, steps):
    """get_rnn_data / get_rnn_token_data (rnn.c:59-113): one-hot x/y in
    darknet's step-major layout x[(j*streams + i)*chars + c] — exactly
    the [steps*streams, chars] order `_rnn_layer` consumes (time rides
    the leading batch axis).  Advances `offsets` in place and returns
    (x, y) one-hot [steps*streams, n_inputs]."""
    streams = len(offsets)
    n = len(stream)
    x = np.zeros((steps, streams, n_inputs), np.float32)
    y = np.zeros((steps, streams, n_inputs), np.float32)
    for i in range(streams):
        idx = (offsets[i] + np.arange(steps)) % n
        curr = stream[idx]
        nxt = stream[(idx + 1) % n]
        if curr.min() < 0 or curr.max() >= n_inputs or \
                nxt.min() < 0 or nxt.max() >= n_inputs:
            raise ValueError("Bad char")           # rnn.c:74 error()
        x[np.arange(steps), i, curr] = 1.0
        y[np.arange(steps), i, nxt] = 1.0
        offsets[i] = (offsets[i] + steps) % n
    return (x.reshape(steps * streams, n_inputs),
            y.reshape(steps * streams, n_inputs))


def _check_trainable(spec):
    for l in spec.layers:
        if l.kind in ("rnn", "crnn", "gru") and l.batch_normalize:
            raise ValueError(
                "rnn train: batch_normalize=1 recurrent sublayers are "
                "unsupported (per-step batch-stat BN inside the scan is "
                "not plumbed — see models/yolov3.forward); drop "
                "batch_normalize from the cfg's recurrent layers")


def train_char_rnn(cfg_path, weights_path=None, filename=None,
                   clear=False, tokenized=False, backup="backup",
                   max_batches=None, seed=0):
    """train_char_rnn (rnn.c:129-215).  Returns trained params."""
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    with open(cfg_path) as f:
        spec = yolo_mod.build_spec(f.read())
    _check_trainable(spec)
    tcfg = net_cfg_to_config(spec)
    if max_batches is not None:
        tcfg.max_batches = max_batches
    net = spec.net_info
    batch = int(net.get("batch", 1))
    steps = max(int(net.get("time_steps", 1)), 1)
    if batch % steps:
        raise ValueError(f"[net] batch {batch} not divisible by "
                         f"time_steps {steps}")
    streams = batch // steps
    n_inputs = int(net.get("inputs", 256))
    base = os.path.splitext(os.path.basename(cfg_path))[0]
    os.makedirs(backup, exist_ok=True)

    if tokenized:
        stream = read_tokenized_data(filename)
    else:
        stream = np.frombuffer(open(filename, "rb").read(), np.uint8) \
            .astype(np.int64)
    if len(stream) < 2:
        raise ValueError(f"{filename}: need at least 2 symbols")

    seen = 0
    if weights_path and os.path.exists(weights_path):
        params, header = yolo_mod.load_darknet_weights(spec, weights_path)
        seen = 0 if clear else int(header[3])
    else:
        params = yolo_mod.init_params(jax.random.PRNGKey(seed), spec)
    tx = make_optimizer(tcfg)
    opt_state = tx.init(params)
    opt_state = yolo_train.fast_forward_opt_state(opt_state, seen // batch)

    cost_layers = [l for l in spec.layers if l.kind == "cost"]
    cl = cost_layers[-1] if cost_layers else None

    import functools
    import optax

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, x, y):
        def loss_fn(p):
            with jax.default_matmul_precision("float32"):
                out = yolo_mod.forward(
                    spec, p, x.reshape(batch, 1, 1, n_inputs), 1)
            out = out.reshape(batch, -1).astype(jnp.float32)
            # [cost sse] delta through the Jacobian-free [softmax]
            # (classifier.c's famous chain — identical here); a cfg
            # without [cost] still trains: sse is darknet's default type
            return darknet_cost(out, y, cl.cost_type if cl else "sse",
                                cl.cost_scale if cl else 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    offsets = rng.integers(0, len(stream), streams)
    avg_loss = -1.0
    i = seen // batch
    while i < tcfg.max_batches:
        i += 1
        t0 = time.time()
        x, y = get_rnn_batch(stream, offsets, n_inputs, steps)
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(x), jnp.asarray(y))
        loss = float(loss)
        avg_loss = loss if avg_loss < 0 else avg_loss * 0.9 + loss * 0.1
        chars = i * batch
        print(f"{i}: {loss:f}, {avg_loss:f} avg, {time.time() - t0:.3f} "
              f"seconds, {chars / len(stream):f} epochs")
        # 1-in-10 per-stream restart (rnn.c:192-199); the state part of
        # the reset is moot here (each step scans from zero state)
        for j in range(streams):
            if rng.integers(0, 10) == 0:
                offsets[j] = rng.integers(0, len(stream))
        if i % 1000 == 0:
            yolo_mod.save_darknet_weights(
                spec, jax.device_get(params),
                os.path.join(backup, f"{base}_{i}.weights"), seen=i * batch)
        if i % 10 == 0:
            yolo_mod.save_darknet_weights(
                spec, jax.device_get(params),
                os.path.join(backup, f"{base}.backup"), seen=i * batch)
    out = os.path.join(backup, f"{base}_final.weights")
    yolo_mod.save_darknet_weights(spec, jax.device_get(params), out,
                                  seen=tcfg.max_batches * batch)
    print(f"Saving weights to {out}")
    return params


# ---------------------------------------------------------------------------
# Stateful single-symbol apply (generation / validation)
# ---------------------------------------------------------------------------

_STATEFUL_KINDS = ("rnn", "gru", "connected", "softmax", "dropout", "cost")


def init_states(spec):
    """Zero hidden state per recurrent layer (darknet calloc's l.state)."""
    states = {}
    for i, l in enumerate(spec.layers):
        if l.kind in ("rnn", "gru"):
            states[i] = jnp.zeros((1, l.hidden if l.kind == "rnn"
                                   else l.out_channels), jnp.float32)
        elif l.kind == "crnn":
            raise ValueError("[crnn] needs spatial input; char verbs "
                             "support flat recurrent stacks (rnn/gru)")
        elif l.kind not in _STATEFUL_KINDS:
            raise ValueError(
                f"[{l.kind}] unsupported in the stateful char-rnn apply")
    return states


def stateful_apply(spec, params, x, states, temperature=1.0):
    """One symbol through the stack with explicit recurrent state —
    the functional equivalent of darknet's network_predict over
    persistent l.state (rnn_layer.c:83-122, gru_layer.c:117-193,
    softmax_layer.c temperature).  x: [1, n_inputs] one-hot float.
    Returns (probs [1, n_out], new_states)."""
    new_states = dict(states)
    for i, l in enumerate(spec.layers):
        p = params[i]
        if l.kind == "rnn":
            s = states[i]
            self_act = {1: "logistic", 2: "loggy"}.get(
                l.rnn_logistic, l.activation)
            inp = yolo_mod._dense(p["input"], x, l.activation,
                                  l.batch_normalize)
            slf = yolo_mod._dense(p["self"], s, self_act,
                                  l.batch_normalize)
            s_new = (s if l.rnn_shortcut else 0.0) + inp + slf
            x = yolo_mod._dense(p["output"], s_new, l.activation,
                                l.batch_normalize)
            new_states[i] = s_new
        elif l.kind == "gru":
            s = states[i]
            dense = lambda name, v: yolo_mod._dense(
                p[name], v, "linear", l.batch_normalize)
            z = jax.nn.sigmoid(dense("input_z", x) + dense("state_z", s))
            r = jax.nn.sigmoid(dense("input_r", x) + dense("state_r", s))
            h = jax.nn.sigmoid(dense("input_h", x)
                               + dense("state_h", r * s))
            s_new = z * s + (1.0 - z) * h
            x = s_new
            new_states[i] = s_new
        elif l.kind == "connected":
            x = yolo_mod._dense(p, x, l.activation, l.batch_normalize)
        elif l.kind == "softmax":
            # softmax_layer.c: softmax(input/temperature)
            x = jax.nn.softmax(x.astype(jnp.float32) / temperature, axis=-1)
        # dropout/cost/avgpool(1x1): identity at inference
    return x, new_states


def _states_tuple(spec, states):
    idxs = sorted(states)
    return idxs, tuple(states[i] for i in idxs)


def generate_char_rnn(cfg_path, weights_path, num=1000, seed_text="\n\n",
                      temp=0.7, rseed=0, token_file=None, echo=True):
    """test_char_rnn (rnn.c:226-281): prime on the seed, then sample
    `num` symbols.  Priming and generation each run as ONE lax.scan on
    device.  Pruning `out < .0001 -> 0` and sample_array's proportional
    draw (utils.c) become a categorical over log-weights.  Returns the
    generated string (tokens joined per print_symbol when token_file)."""
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    with open(cfg_path) as f:
        spec = yolo_mod.build_spec(f.read())
    params, _ = yolo_mod.load_darknet_weights(spec, weights_path)
    net = spec.net_info
    n_inputs = int(net.get("inputs",
                           int(net.get("channels", 256))
                           * int(net.get("width", 1))
                           * int(net.get("height", 1))))
    tokens = read_tokens(token_file) if token_file else None
    states = init_states(spec)
    idxs, st = _states_tuple(spec, states)

    def apply_sym(st_tuple, sym):
        x = jax.nn.one_hot(sym, n_inputs, dtype=jnp.float32)[None]
        probs, ns = stateful_apply(spec, params,
                                   x, dict(zip(idxs, st_tuple)),
                                   temperature=temp)
        return tuple(ns[i] for i in idxs), probs[0]

    seed_syms = np.frombuffer(seed_text.encode("latin-1"), np.uint8) \
        .astype(np.int32)
    if len(seed_syms) > 1:
        st, _ = jax.lax.scan(lambda c, s: (apply_sym(c, s)[0], 0.0),
                             st, jnp.asarray(seed_syms[:-1]))
    c0 = jnp.asarray(seed_syms[-1] if len(seed_syms) else 0, jnp.int32)

    def gen_step(carry, key):
        st_tuple, c = carry
        st_tuple, probs = apply_sym(st_tuple, c)
        w = jnp.where(probs < 1e-4, 0.0, probs)     # rnn.c:273-275
        nxt = jax.random.categorical(
            key, jnp.where(w > 0, jnp.log(w), -jnp.inf))
        return (st_tuple, nxt.astype(jnp.int32)), nxt

    keys = jax.random.split(jax.random.PRNGKey(rseed), num)
    _, syms = jax.lax.scan(gen_step, (st, c0), keys)
    syms = np.asarray(syms)
    if tokens:
        text = "".join(f"{tokens[s]} " for s in seed_syms) + \
            "".join(f"{tokens[s]} " for s in syms)
    else:
        text = seed_text + bytes(syms.astype(np.uint8)).decode(
            "latin-1", errors="replace")
    if echo:
        print(text)
    return text


def valid_char_rnn(cfg_path, weights_path, text, seed_text="\n\n"):
    """valid_char_rnn (rnn.c:377-421): log2-likelihood of each next
    character after seed priming; returns (perplexity, word_perplexity)
    and prints the final summary line (darknet prints a running line per
    character; the last line carries the same numbers)."""
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    with open(cfg_path) as f:
        spec = yolo_mod.build_spec(f.read())
    params, _ = yolo_mod.load_darknet_weights(spec, weights_path)
    net = spec.net_info
    n_inputs = int(net.get("inputs",
                           int(net.get("channels", 256))
                           * int(net.get("width", 1))
                           * int(net.get("height", 1))))
    states = init_states(spec)
    idxs, st = _states_tuple(spec, states)

    def apply_sym(st_tuple, sym):
        x = jax.nn.one_hot(sym, n_inputs, dtype=jnp.float32)[None]
        probs, ns = stateful_apply(spec, params, x,
                                   dict(zip(idxs, st_tuple)))
        return tuple(ns[i] for i in idxs), probs[0]

    seed_syms = np.frombuffer(seed_text.encode("latin-1"), np.uint8) \
        .astype(np.int32)
    for s in seed_syms:                              # rnn.c:391-396
        st, _ = apply_sym(st, jnp.asarray(s))

    syms = np.frombuffer(text.encode("latin-1") if isinstance(text, str)
                         else text, np.uint8).astype(np.int32)
    if len(syms) < 2:
        raise ValueError("valid: need at least 2 characters")

    def step(carry, pair):
        st_tuple = carry
        c, nxt = pair
        st_tuple, probs = apply_sym(st_tuple, c)
        return st_tuple, jnp.log2(jnp.maximum(probs[nxt], 1e-30))

    pairs = jnp.stack([jnp.asarray(syms[:-1]), jnp.asarray(syms[1:])],
                      axis=1)
    _, log2p = jax.lax.scan(step, st, pairs)
    log2p = np.asarray(log2p)
    count = len(log2p)
    words = 1 + int(np.sum(np.isin(syms[1:], [ord(" "), ord("\n"),
                                              ord("\t")])))
    with np.errstate(over="ignore"):     # C's pow() overflows to inf too
        ppl = float(np.exp2(-log2p.sum() / np.float64(count)))
        wppl = float(np.exp2(-log2p.sum() / np.float64(words)))
    print(f"{count} Perplexity: {ppl:4.4f}    Word Perplexity: {wppl:4.4f}")
    return ppl, wppl
