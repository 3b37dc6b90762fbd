"""Char-RNN task family (`rnn.c`, dispatched from `darknet.c:351`).

Oracles transcribe the reference FORMULAS:
- get_rnn_data / get_rnn_token_data one-hot layout + offset advance
  (rnn.c:59-113: x[(j*streams + i)*chars + curr] = 1)
- the stateful single-symbol predict (persistent l.state across
  network_predict calls, rnn_layer.c:83-122) must equal the batch scan
  over the same symbol sequence — darknet's train/predict layout duality
- valid_char_rnn's log2-likelihood accounting (rnn.c:398-416)
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.models.darknet_cfg import make_rnn_cfg
from betapose_tpu.tools import char_rnn


TINY = dict(inputs=16, hidden=8, n_layers=2, batch=6, time_steps=6)


class TestRnnBatchOracle:
    """get_rnn_data (rnn.c:59-88) transcription."""

    def test_one_hot_layout_step_major(self):
        stream = np.arange(10) % 4          # symbols 0..3
        offsets = np.array([0, 5])
        x, y = char_rnn.get_rnn_batch(stream, offsets, 4, steps=3)
        assert x.shape == y.shape == (6, 4)  # steps*streams rows
        # row index = j*streams + i (step-major): stream 0 offset 0 gives
        # curr 0,1,2 at rows 0,2,4; stream 1 offset 5 gives 1,2,3 at 1,3,5
        assert np.argmax(x[[0, 2, 4]], -1).tolist() == [0, 1, 2]
        assert np.argmax(x[[1, 3, 5]], -1).tolist() == [1, 2, 3]
        # y is next-symbol (rnn.c:84: text[j+offset+1])
        assert np.argmax(y[[0, 2, 4]], -1).tolist() == [1, 2, 3]
        assert x.sum() == y.sum() == 6      # strict one-hot
        # offsets advance by steps, modulo stream length (rnn.c:86)
        assert offsets.tolist() == [3, 8]

    def test_wraparound(self):
        stream = np.array([1, 2, 3])
        offsets = np.array([2])
        x, y = char_rnn.get_rnn_batch(stream, offsets, 4, steps=2)
        assert np.argmax(x, -1).tolist() == [3, 1]
        assert np.argmax(y, -1).tolist() == [1, 2]

    def test_bad_symbol_errors(self):
        # rnn.c:74 error("Bad char") on out-of-range tokenized symbols
        with pytest.raises(ValueError, match="Bad char"):
            char_rnn.get_rnn_batch(np.array([0, 99]), np.array([0]), 4, 2)


class TestStatefulApplyEquivalence:
    """stateful_apply stepped symbol-by-symbol must equal the batch scan
    (darknet feeds training batches [steps*streams] but generates with
    single-symbol network_predict over persistent l.state; both layouts
    must agree — rnn_layer.c:83-122)."""

    @pytest.mark.parametrize("extra", ["", "logistic"])
    def test_matches_batch_forward(self, extra):
        cfg = make_rnn_cfg(**TINY)
        if extra == "":
            cfg = cfg.replace("logistic=1\n", "")
        spec = yolo_mod.build_spec(cfg)
        params = yolo_mod.init_params(jax.random.PRNGKey(0), spec)
        syms = np.array([3, 1, 4, 1, 5, 9]) % TINY["inputs"]

        # batch path: one stream of 6 steps through forward's lax.scan
        x = np.zeros((6, TINY["inputs"]), np.float32)
        x[np.arange(6), syms] = 1.0
        batch_out = np.asarray(yolo_mod.forward(
            spec, params, jnp.asarray(x).reshape(6, 1, 1, -1), 1)
        ).reshape(6, -1)

        # stateful path: one symbol at a time, threading state
        states = char_rnn.init_states(spec)
        step_out = []
        for s in syms:
            xi = jnp.zeros((1, TINY["inputs"]), jnp.float32).at[0, s].set(1.0)
            probs, states = char_rnn.stateful_apply(spec, params, xi, states)
            step_out.append(np.asarray(probs)[0])
        np.testing.assert_allclose(np.stack(step_out), batch_out,
                                   rtol=1e-5, atol=1e-6)

    def test_gru_matches_batch_forward(self):
        cfg = make_rnn_cfg(**TINY).replace("[rnn]", "[gru]")
        spec = yolo_mod.build_spec(cfg)
        params = yolo_mod.init_params(jax.random.PRNGKey(1), spec)
        syms = np.array([0, 7, 2, 2, 11, 5])
        x = np.zeros((6, TINY["inputs"]), np.float32)
        x[np.arange(6), syms] = 1.0
        batch_out = np.asarray(yolo_mod.forward(
            spec, params, jnp.asarray(x).reshape(6, 1, 1, -1), 1)
        ).reshape(6, -1)
        states = char_rnn.init_states(spec)
        step_out = []
        for s in syms:
            xi = jnp.zeros((1, TINY["inputs"]), jnp.float32).at[0, s].set(1.0)
            probs, states = char_rnn.stateful_apply(spec, params, xi, states)
            step_out.append(np.asarray(probs)[0])
        np.testing.assert_allclose(np.stack(step_out), batch_out,
                                   rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Memorize a short repeating byte stream (the e2e contract: train ->
    save -> reload -> generate/valid)."""
    d = tmp_path_factory.mktemp("charrnn")
    cfg_path = str(d / "tiny-rnn.cfg")
    open(cfg_path, "w").write(make_rnn_cfg(
        inputs=256, hidden=48, n_layers=2, batch=64, time_steps=16,
        max_batches=60, lr=0.1))
    data_path = str(d / "tiny.txt")
    open(data_path, "wb").write(b"hello world. " * 200)
    params = char_rnn.train_char_rnn(cfg_path, None, filename=data_path,
                                     backup=str(d / "backup"))
    return cfg_path, str(d / "backup" / "tiny-rnn_final.weights"), params


class TestEndToEnd:
    def test_train_saves_final_and_rolling(self, trained):
        cfg_path, final, _ = trained
        assert os.path.exists(final)
        assert os.path.exists(os.path.join(os.path.dirname(final),
                                           "tiny-rnn.backup"))

    def test_generate_memorized_text(self, trained):
        cfg_path, final, _ = trained
        out = char_rnn.generate_char_rnn(cfg_path, final, num=52,
                                         seed_text="hel", temp=0.7,
                                         rseed=1, echo=False)
        assert out.startswith("hel")
        # a memorized loop regenerates its own phrase
        assert "hello world." in out[3:]

    def test_generate_deterministic_per_seed(self, trained):
        cfg_path, final, _ = trained
        a = char_rnn.generate_char_rnn(cfg_path, final, num=30, rseed=7,
                                       echo=False)
        b = char_rnn.generate_char_rnn(cfg_path, final, num=30, rseed=7,
                                       echo=False)
        assert a == b

    def test_valid_perplexity(self, trained, capsys):
        cfg_path, final, _ = trained
        ppl, wppl = char_rnn.valid_char_rnn(cfg_path, final,
                                            "hello world. hello world.")
        assert ppl < 1.5                    # in-distribution: memorized
        out = capsys.readouterr().out
        assert "Perplexity:" in out and "Word Perplexity:" in out
        ppl_bad, _ = char_rnn.valid_char_rnn(cfg_path, final,
                                             "zqxjkvbwpfg")
        assert ppl_bad > 10 * ppl           # off-distribution: surprised

    def test_cli_generate_dispatch(self, trained, capsys):
        from betapose_tpu.tools import darknet_cli
        cfg_path, final, _ = trained
        darknet_cli.main(["rnn", "generate", cfg_path, final,
                          "-len", "20", "-seed", "hel", "-srand", "3"])
        assert "hel" in capsys.readouterr().out


class TestRefusals:
    def test_bn_recurrent_refused(self, tmp_path):
        cfg_path = str(tmp_path / "bn.cfg")
        open(cfg_path, "w").write(make_rnn_cfg(batch_normalize=True,
                                               **TINY))
        data = str(tmp_path / "d.txt")
        open(data, "wb").write(b"ab" * 40)
        with pytest.raises(ValueError, match="batch_normalize"):
            char_rnn.train_char_rnn(cfg_path, None, filename=data)

    def test_batch_not_divisible(self, tmp_path):
        cfg_path = str(tmp_path / "bad.cfg")
        open(cfg_path, "w").write(
            make_rnn_cfg(inputs=8, hidden=4, batch=5, time_steps=2))
        data = str(tmp_path / "d.txt")
        open(data, "wb").write(b"ab" * 40)
        with pytest.raises(ValueError, match="divisible"):
            char_rnn.train_char_rnn(cfg_path, None, filename=data)

    def test_tactics_verbs_scope_cut(self, capsys):
        from betapose_tpu.tools import darknet_cli
        rc = darknet_cli.main(["rnn", "vec", "x.cfg"])
        assert isinstance(rc, darknet_cli.CliError)
        assert "scope-cut" in capsys.readouterr().out


class TestTokenized:
    def test_token_roundtrip(self, tmp_path):
        p = str(tmp_path / "tok.txt")
        open(p, "w").write("3 1 4 1 5")
        assert char_rnn.read_tokenized_data(p).tolist() == [3, 1, 4, 1, 5]
        t = str(tmp_path / "toks.txt")
        open(t, "w").write("the\ncat\nsat\n")
        assert char_rnn.read_tokens(t) == ["the", "cat", "sat"]
