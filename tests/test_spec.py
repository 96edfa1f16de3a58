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


@pytest.fixture(scope="module")
def engine16(tmp_path_factory):
    """Same tiny model at a 16-token window: generation wraps almost
    immediately, exercising the wrapped verify-then-commit regime."""
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf16") / "tiny"))
    out = str(tmp_path_factory.mktemp("x16") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    return Engine.from_xalm(out, context=16, progress=False)


def test_spec_wrapped_verify_commit(engine16, monkeypatch):
    """Speculation KEEPS WORKING past the ring wrap (VERDICT r3 #6): the
    no-write verify + accepted-prefix commit must emit exactly the plain
    greedy stream while accepting drafts in the wrapped regime."""
    prompt = [1, 259, 260, 10, 20, 30]
    n = 40  # window 16: tokens beyond ~10 are generated fully wrapped
    ref, _ = engine16.generate(prompt, n, stop_on_eos=False, segment=1)
    k = 4

    def oracle(ids, kk, **kw):
        done = len(ids) - len(prompt)
        return ref[done : done + kk]

    monkeypatch.setattr(spec, "ngram_propose", oracle)
    got, stats = generate_spec(engine16, prompt, n, stop_on_eos=False, k=k)
    assert got == ref
    # with an oracle draft, acceptance must persist through the wrap: the
    # wrapped region alone spans ~24 tokens = ~5 full-acceptance chunks
    assert stats.spec_accepted >= 16


def test_spec_wrapped_quantized_cache(engine16, tmp_path_factory, monkeypatch):
    """Wrapped verify-commit on the int8 KV cache: codes AND scale planes
    ride the commit scatter + sink requant."""
    import jax.numpy as jnp

    hf = make_tiny_model(str(tmp_path_factory.mktemp("hfq") / "tiny"))
    out = str(tmp_path_factory.mktemp("xq") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    eng = Engine.from_xalm(out, context=16, kv_dtype=jnp.int8, progress=False)
    prompt = [1, 259, 260, 10, 20, 30]
    n = 36
    ref, _ = eng.generate(prompt, n, stop_on_eos=False, segment=1)

    def oracle(ids, kk, **kw):
        done = len(ids) - len(prompt)
        return ref[done : done + kk]

    monkeypatch.setattr(spec, "ngram_propose", oracle)
    got, stats = generate_spec(eng, prompt, n, stop_on_eos=False, k=4)
    assert got == ref
    assert stats.spec_accepted >= 12


def test_spec_draft_model(engine):
    """Two-model speculation: a draft engine (here: the same checkpoint —
    its greedy continuations are near-oracle) proposes, the target
    verifies; output equals plain greedy and drafts are accepted."""
    prompt = [1, 259, 260, 10, 20]
    n = 18
    ref, _ = engine.generate(prompt, n, stop_on_eos=False, segment=1)
    draft = Engine(engine.cfg, engine.params, engine.tokenizer)
    got, stats = generate_spec(
        engine, prompt, n, stop_on_eos=False, k=4, draft_engine=draft
    )
    assert got == ref
    assert stats.spec_proposed > 0
    # same-weights drafts should mostly be accepted (ties aside)
    assert stats.spec_accepted >= stats.spec_proposed // 2


def test_spec_draft_model_through_wrap(engine16):
    """Draft-model speculation survives the ring wrap: the draft's cache
    stays in sync (hydrating emitted-but-unconsumed tokens) and the target
    commits only accepted rows."""
    prompt = [1, 259, 260, 10, 20, 30]
    n = 40
    ref, _ = engine16.generate(prompt, n, stop_on_eos=False, segment=1)
    draft = Engine(engine16.cfg, engine16.params, engine16.tokenizer)
    got, stats = generate_spec(
        engine16, prompt, n, stop_on_eos=False, k=4, draft_engine=draft
    )
    assert got == ref
    assert stats.spec_proposed > 0
