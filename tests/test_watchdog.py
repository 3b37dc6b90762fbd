"""StallWatchdog: liveness monitor for wedged device RPCs (core/watchdog).

The failure mode it guards (a hung tunnel RPC blocking the host thread
inside native code forever) cannot be reproduced in a unit test; these
tests pin the monitor mechanics with an injected exit_fn instead.
"""

import threading
import time

from betapose_tpu.core.watchdog import (StallWatchdog, chip_claimed,
                                        claim_chip, release_chip)


class TestStallWatchdog:
    def test_fires_after_timeout(self):
        fired = threading.Event()
        codes = []

        def fake_exit(code):
            codes.append(code)
            fired.set()

        wd = StallWatchdog(0.2, label="t", exit_code=7, check_every=0.05,
                           exit_fn=fake_exit)
        with wd:
            assert fired.wait(2.0), "watchdog never fired"
        assert codes == [7]

    def test_beat_prevents_firing(self):
        fired = threading.Event()
        wd = StallWatchdog(0.3, check_every=0.05,
                           exit_fn=lambda c: fired.set())
        with wd:
            for _ in range(10):
                time.sleep(0.1)
                wd.beat()
            assert not fired.is_set()
        # after stop() the monitor must not fire even without beats
        time.sleep(0.5)
        assert not fired.is_set()

    def test_zero_timeout_disables(self):
        wd = StallWatchdog(0.0, exit_fn=lambda c: (_ for _ in ()).throw(
            AssertionError("disabled watchdog fired")))
        with wd:
            assert not wd.enabled
            assert wd._thread is None
            time.sleep(0.1)

    def test_yields_to_chip_claim(self, tmp_path):
        """A fresh chip-claim file makes the monitor exit with the yield
        code even while beats keep arriving (training is healthy but a
        measurement run has priority)."""
        claim = str(tmp_path / "claim")
        fired = threading.Event()
        codes = []

        def fake_exit(code):
            codes.append(code)
            fired.set()

        wd = StallWatchdog(30.0, check_every=0.05, exit_fn=fake_exit,
                           yield_to=claim)
        with wd:
            wd.beat()
            time.sleep(0.2)
            assert not fired.is_set()  # no claim yet
            claim_chip(label="bench", path=claim)
            assert fired.wait(2.0), "never yielded to the claim"
            wd.beat()
        assert codes == [4]

    def test_chip_claim_lifecycle(self, tmp_path):
        """claim/release roundtrip; stale claims (a bench that os._exit'd
        without its atexit) are ignored."""
        import os
        claim = str(tmp_path / "claim")
        assert not chip_claimed(claim)
        claim_chip(label="bench", path=claim)
        assert chip_claimed(claim)
        # a stale mtime (leaked claim) no longer blocks training
        old = time.time() - 3600
        os.utime(claim, (old, old))
        assert not chip_claimed(claim)
        release_chip(claim)
        assert not chip_claimed(claim)
        release_chip(claim)  # idempotent

    def test_cli_knob_plumbed(self):
        """Both long-tier drivers expose --stall_timeout (default 900,
        0 = off) so a wedged tunnel RPC exits instead of hanging."""
        from betapose_tpu.tools import sweep, occl_multiobj
        for mod in (sweep, occl_multiobj):
            p_actions = {a.dest: a for a in
                         _parser_of(mod)._actions}
            assert "stall_timeout" in p_actions, mod.__name__
            assert p_actions["stall_timeout"].default == 900.0


def _parser_of(mod):
    """Extract the argparse parser from a tool main() without running it
    (both mains build the parser before parsing; reproduce that here by
    calling main with --help suppressed is messier — instead parse known
    args via a probe)."""
    import argparse

    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def capture(self, *a, **k):
        captured["parser"] = self
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = capture
    try:
        try:
            mod.main([])
        except SystemExit:
            pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    return captured["parser"]
