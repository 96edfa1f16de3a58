"""N-gram speculative decoding: proposer unit tests + greedy-exactness.

generate_spec's contract is that its output is identical to greedy
decoding (Engine.generate) — acceptance is decided by the verify pass's
own argmax, so any draft source is quality-neutral."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime import spec
from xalm_tpu.runtime.engine import Engine
from xalm_tpu.runtime.spec import generate_spec, ngram_propose


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    return Engine.from_xalm(out)


def test_ngram_propose_basic():
    # suffix [7, 8] occurred at index 1; continuation 9, 4, 5
    ids = [3, 7, 8, 9, 4, 5, 7, 8]
    assert ngram_propose(ids, 3) == [9, 4, 5]
    assert ngram_propose(ids, 1) == [9]
    assert ngram_propose(ids, 8) == [9, 4, 5, 7, 8]


def test_ngram_propose_recency():
    # the MOST RECENT earlier occurrence of the suffix wins
    ids = [1, 2, 10, 5, 1, 2, 20, 5, 1, 2]
    assert ngram_propose(ids, 2) == [20, 5]


def test_ngram_propose_falls_back_to_shorter_n():
    # trigram suffix never repeats, bigram does
    ids = [9, 1, 2, 30, 8, 1, 2]
    assert ngram_propose(ids, 2, max_n=3) == [30, 8]


def test_ngram_propose_no_match():
    assert ngram_propose([1, 2, 3, 4], 4) == []
    assert ngram_propose([5], 4) == []
    assert ngram_propose([], 4) == []
    # suffix matches only itself
    assert ngram_propose([1, 2, 1, 2], 2, max_n=4, min_n=2) == [1, 2]


def test_spec_equals_generate(engine):
    for prompt in ([1, 259, 260, 10, 20], [1, 300, 301, 300, 301, 300]):
        ref, _ = engine.generate(prompt, 16, stop_on_eos=False, segment=1)
        got, stats = generate_spec(engine, prompt, 16, stop_on_eos=False)
        assert got == ref
        assert stats.generated_tokens == 16
        assert stats.spec_accepted <= stats.spec_proposed


def test_spec_eos_stop(engine):
    prompt = [1, 259, 260]
    ref, _ = engine.generate(prompt, 40, stop_on_eos=True, segment=1)
    got, _ = generate_spec(engine, prompt, 40, stop_on_eos=True)
    assert got == ref


def test_spec_accepts_true_drafts(engine, monkeypatch):
    """With an oracle proposer (the true greedy continuation) every draft is
    accepted: output unchanged, and far fewer verify calls than tokens."""
    prompt = [1, 259, 260, 10, 20]
    n = 18
    ref, _ = engine.generate(prompt, n, stop_on_eos=False, segment=1)
    k = 5

    def oracle(ids, kk, **kw):
        done = len(ids) - len(prompt)  # emitted so far (incl. pending)
        return ref[done : done + kk]

    monkeypatch.setattr(spec, "ngram_propose", oracle)
    got, stats = generate_spec(engine, prompt, n, stop_on_eos=False, k=k)
    assert got == ref
    calls = stats.spec_proposed // k
    # every full verify emits k+1 tokens
    assert calls <= -(-n // (k + 1)) + 1
    assert stats.spec_accepted >= n - calls


def test_spec_ring_wrap_gate(engine):
    """Generation past the ring wrap: speculation gates itself off and the
    output still equals plain greedy stepping through the wrap."""
    prompt = [1, 259, 260, 10, 20, 30]
    n = engine.cfg.max_seq_len - len(prompt) + 24  # cross the window edge
    ref, _ = engine.generate(prompt, n, stop_on_eos=False, segment=1)
    got, stats = generate_spec(engine, prompt, n, stop_on_eos=False, segment=1)
    assert got == ref
    assert stats.generated_tokens == n


def test_spec_on_sharded_engine(tmp_path_factory):
    """Speculative decoding composes with the tp/dp engine (the verify
    chunk runs the sharded forward; logits_mode='all' comes back
    vocab-global after the engine's gather)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from xalm_tpu.parallel.mesh import make_mesh
    from xalm_tpu.parallel.sharded_engine import ShardedEngine

    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf2") / "tiny"))
    out = str(tmp_path_factory.mktemp("x2") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    eng = ShardedEngine.from_xalm(out, make_mesh(dp=1, tp=2))
    ref, _ = eng.generate([1, 259, 260, 10], 10, stop_on_eos=False, segment=1)
    got, stats = generate_spec(eng, [1, 259, 260, 10], 10, stop_on_eos=False)
    assert got == ref
