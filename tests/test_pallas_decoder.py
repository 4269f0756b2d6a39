"""Parity tests for the fused decoder-chunk Pallas kernel.

The kernel (ops/pallas_decoder.py) must reproduce the XLA ``lax.scan``
decode path (models/decoder.py) exactly: same step math as the reference
hot loop (/root/reference/modules/tacotron2.py:180-207) with
location-sensitive attention (modules/attention.py:39-45,67-86).

Runs in interpreter mode on the CPU test mesh; deterministic parity is
checked with prenet dropout disabled (the only stochastic op at eval).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
from multilingual_text_to_speech_tpu.ops.pallas_decoder import (
    extract_decoder_bundle,
    fused_decode_chunk,
    supports,
)
from tests.corpus_utils import tiny_model_hp


def tiny_hp(**over):
    return tiny_model_hp(
        multi_speaker=True, multi_language=True,
        speaker_number=4, language_number=2, languages=["de", "fr"],
        decoder_regularization="zoneout", **over)


def _setup(batch=6, text_len=24, regularization="zoneout",
           attention_type="location_sensitive", **hp_over):
    hp = tiny_hp()
    hp.dropout = 0.0
    hp.decoder_regularization = regularization
    hp.attention_type = attention_type
    for k, v in hp_over.items():
        setattr(hp, k, v)
    assert supports(hp)

    model = Tacotron(hp, train=False)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (batch, text_len)),
                       jnp.int32)
    lengths = jnp.asarray(
        np.clip(rng.randint(text_len // 2, text_len + 1, batch), 2, text_len),
        jnp.int32)
    speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch), jnp.int32)
    languages = jnp.asarray(np.arange(batch) % hp.language_number, jnp.int32)

    key = jax.random.PRNGKey(0)
    target = jnp.zeros((batch, 8, hp.num_mels), jnp.float32)
    variables = jax.jit(model.init)(
        key, text, lengths, target, jnp.full((batch,), 8, jnp.int32),
        speakers, languages, 0.0, key)

    encode = jax.jit(functools.partial(model.apply,
                                       method=Tacotron.encode_for_inference))
    memory, mt, mask, carry = encode(variables, text, lengths,
                                     speakers, languages)
    dec_xla = jax.jit(functools.partial(model.apply,
                                        method=Tacotron.decode_chunk),
                      static_argnames=("chunk_frames",))
    return hp, variables, memory, mt, mask, carry, dec_xla


def _fused(hp, variables, *args, block_cap=128, chunk=16):
    bundle = extract_decoder_bundle(variables, jnp.float32)
    zo = hp.decoder_regularization == "zoneout"
    return fused_decode_chunk(
        bundle, *args, chunk,
        dropout_rate=0.0,
        zoneout_h=hp.zoneout_hidden if zo else 0.0,
        zoneout_c=hp.zoneout_cell if zo else 0.0,
        block_cap=block_cap, interpret=True)


@pytest.mark.parametrize("regularization", ["zoneout", "dropout"])
def test_fused_step_matches_xla_scan(regularization):
    """Short-horizon check: tight float32 parity on the per-step math.

    (The kernel folds the location conv+projection into one banded matmul,
    which reorders the f32 tap summation; on an UNTRAINED random network
    the autoregressive loop amplifies that ~1e-7 reassociation noise per
    step, so long-horizon equality is checked separately with a looser
    bound below.)"""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup(
        regularization=regularization)
    rng = jax.random.PRNGKey(42)
    chunk = 2

    carry_x, (spec_x, stop_x) = dec_xla(variables, carry, memory, mt, mask,
                                        rng, chunk_frames=chunk)
    carry_p, (spec_p, stop_p) = _fused(hp, variables, carry, memory, mt,
                                       mask, rng, chunk=chunk)

    np.testing.assert_allclose(spec_p, spec_x, atol=3e-5)
    np.testing.assert_allclose(stop_p, stop_x, atol=3e-5)
    np.testing.assert_allclose(carry_p["h_att"], carry_x["h_att"], atol=3e-5)
    np.testing.assert_allclose(carry_p["c_gen"], carry_x["c_gen"], atol=3e-5)
    np.testing.assert_allclose(carry_p["context"], carry_x["context"],
                               atol=3e-5)
    np.testing.assert_allclose(carry_p["att_state"]["weights"],
                               carry_x["att_state"]["weights"], atol=3e-5)


def test_fused_long_chunk_stays_close():
    """16 AR steps: bounded drift vs the XLA scan on a random-init net."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup()
    rng = jax.random.PRNGKey(42)
    carry_x, (spec_x, _) = dec_xla(variables, carry, memory, mt, mask,
                                   rng, chunk_frames=16)
    carry_p, (spec_p, _) = _fused(hp, variables, carry, memory, mt, mask,
                                  rng, chunk=16)
    assert float(np.max(np.abs(spec_p - spec_x))) < 5e-2
    # attention mass must track: cumulative weights sum to steps taken
    np.testing.assert_allclose(
        np.asarray(carry_p["att_state"]["weights"]).sum(-1), 16.0, rtol=1e-4)


def test_fused_chunks_chain_through_carry():
    """Carry pytrees are interchangeable across chunk boundaries."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup()
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    carry_x, _ = dec_xla(variables, carry, memory, mt, mask, k1,
                         chunk_frames=2)
    carry_p, _ = _fused(hp, variables, carry, memory, mt, mask, k1, chunk=2)

    # second chunk: pallas carry into pallas, compared against xla into xla
    _, (spec_x2, _) = dec_xla(variables, carry_x, memory, mt, mask, k2,
                              chunk_frames=2)
    _, (spec_p2, _) = _fused(hp, variables, carry_p, memory, mt, mask, k2,
                             chunk=2)
    np.testing.assert_allclose(spec_p2, spec_x2, atol=2e-4)

    # and cross: xla carry into the fused kernel
    _, (spec_xp, _) = _fused(hp, variables, carry_x, memory, mt, mask, k2,
                             chunk=2)
    np.testing.assert_allclose(spec_xp, spec_x2, atol=2e-4)


def test_fused_chunk_batch_blocking():
    """Splitting the batch into blocks must not change results."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup(batch=6)
    rng = jax.random.PRNGKey(3)
    _, (spec_full, _) = _fused(hp, variables, carry, memory, mt, mask, rng,
                               block_cap=128)
    _, (spec_split, _) = _fused(hp, variables, carry, memory, mt, mask, rng,
                                block_cap=3)
    # blocks see different PRNG seeds, but dropout=0 so results are equal
    np.testing.assert_allclose(spec_split, spec_full, atol=1e-6)


def test_fused_chunk_dropout_is_stochastic_but_bounded():
    """With prenet dropout on (the reference keeps it active at inference,
    tacotron2.py:40) outputs differ across seeds but stay finite and the
    attention weights still sum to 1 (cumulative sums to steps taken)."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup()
    bundle = extract_decoder_bundle(variables, jnp.float32)
    kwargs = dict(dropout_rate=0.5, zoneout_h=hp.zoneout_hidden,
                  zoneout_c=hp.zoneout_cell,
                  interpret=True)
    c1, (s1, _) = fused_decode_chunk(bundle, carry, memory, mt, mask,
                                     jax.random.PRNGKey(1), 8, **kwargs)
    c2, (s2, _) = fused_decode_chunk(bundle, carry, memory, mt, mask,
                                     jax.random.PRNGKey(2), 8, **kwargs)
    assert np.isfinite(np.asarray(s1)).all()
    assert float(np.max(np.abs(np.asarray(s1) - np.asarray(s2)))) > 1e-6
    # cumulative attention weights: 8 steps of a softmax each summing to 1
    cum = np.asarray(c1["att_state"]["weights"]).sum(axis=-1)
    np.testing.assert_allclose(cum, 8.0, rtol=1e-4)


def test_supports_gates_unsupported_configs():
    hp = tiny_hp()
    assert supports(hp)
    # round 3: the forward family and any prenet depth >= 1 are covered
    hp.attention_type = "forward"
    assert supports(hp)
    hp.attention_type = "forward_transition_agent"
    assert supports(hp)
    hp.prenet_layers = 3
    assert supports(hp)
    hp.prenet_layers = 0
    assert not supports(hp)


def test_fused_blocked_long_text_matches_xla_scan():
    """Texts past the single-fold limit (256) take the T-BLOCKED attention
    layout (Tb=128 column blocks, banded cum windows, shared qe/red) with
    internal padding to a block multiple: parity vs the XLA scan at
    t_len=300 (padded to 384, 3 blocks), carry sliced back to 300."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup(
        batch=4, text_len=300)
    rng = jax.random.PRNGKey(7)
    chunk = 4

    carry_x, (spec_x, stop_x) = dec_xla(variables, carry, memory, mt, mask,
                                        rng, chunk_frames=chunk)
    carry_p, (spec_p, stop_p) = _fused(hp, variables, carry, memory, mt,
                                       mask, rng, chunk=chunk)

    np.testing.assert_allclose(spec_p, spec_x, atol=5e-5)
    np.testing.assert_allclose(stop_p, stop_x, atol=5e-5)
    assert carry_p["att_state"]["weights"].shape == (4, 300)
    np.testing.assert_allclose(carry_p["att_state"]["weights"],
                               carry_x["att_state"]["weights"], atol=5e-5)
    # padded positions must receive (essentially) no attention mass
    np.testing.assert_allclose(
        np.asarray(carry_p["att_state"]["weights"]).sum(-1), chunk, rtol=1e-4)


def test_fused_blocked_t512_supported():
    """supports_shapes admits 512 and the blocked kernel stays exact there
    (chaining through the carry like the serving driver does)."""
    from multilingual_text_to_speech_tpu.ops import pallas_decoder as pd

    assert pd.supports_shapes(512)
    assert not pd.supports_shapes(513)

    hp, variables, memory, mt, mask, carry, dec_xla = _setup(
        batch=2, text_len=512)
    rng = jax.random.PRNGKey(11)
    carry_x, (spec_x, _) = dec_xla(variables, carry, memory, mt, mask, rng,
                                   chunk_frames=3)
    carry_p, (spec_p, _) = _fused(hp, variables, carry, memory, mt, mask,
                                  rng, chunk=3)
    np.testing.assert_allclose(spec_p, spec_x, atol=5e-5)
    _, (spec_x2, _) = dec_xla(variables, carry_x, memory, mt, mask, rng,
                              chunk_frames=2)
    _, (spec_p2, _) = _fused(hp, variables, carry_p, memory, mt, mask, rng,
                             chunk=2)
    np.testing.assert_allclose(spec_p2, spec_x2, atol=2e-4)


def test_vmem_cap_no_fit_sentinel():
    """ADVICE r2: _auto_block_cap reports no-fit (0) instead of clamping to
    8 rows when the fixed operands alone bust the budget; fits_vmem gates
    and fused_decode_chunk raises instead of compile-failing in Mosaic."""
    from multilingual_text_to_speech_tpu.ops import pallas_decoder as pd

    # serving dims that fit comfortably
    assert pd.fits_vmem(128, 512, 128, 1024, 80, 256, 64, jnp.bfloat16)
    # f32 at T=512 with big hidden: fixed operands alone exceed the budget
    assert pd._auto_block_cap(512, 512, 512, 1024, 80, 256, 64,
                              jnp.float32) == 0
    assert not pd.fits_vmem(512, 512, 512, 1024, 80, 256, 64, jnp.float32)

    hp, variables, memory, mt, mask, carry, _ = _setup(batch=2, text_len=24)
    with pytest.raises(ValueError, match="fits_vmem"):
        _fused(hp, variables, carry, memory, mt, mask,
               jax.random.PRNGKey(0), block_cap=0)


def test_fused_int8_gates_stay_close():
    """W8A8 serving mode: int8 LSTM-gate matmuls (per-column weight scales,
    dynamic per-row activation quant) must track the f32 XLA scan within
    quantization noise over 16 AR steps, and keep the attention mass
    normalized.  Tolerances are looser than the bf16 tests by design —
    int8 is a lossy serving-only mode (quality on a TRAINED model is
    quantified separately in PARITY.md)."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup()
    rng = jax.random.PRNGKey(42)
    carry_x, (spec_x, stop_x) = dec_xla(variables, carry, memory, mt, mask,
                                        rng, chunk_frames=16)
    bundle = extract_decoder_bundle(variables, jnp.float32,
                                    quantize_gates=True)
    assert bundle["att_w"].dtype == jnp.int8
    assert bundle["gen_w"].dtype == jnp.int8
    carry_q, (spec_q, stop_q) = fused_decode_chunk(
        bundle, carry, memory, mt, mask, rng, 16,
        dropout_rate=0.0, zoneout_h=hp.zoneout_hidden,
        zoneout_c=hp.zoneout_cell, block_cap=128, interpret=True)
    rel = (np.linalg.norm(np.asarray(spec_q) - np.asarray(spec_x))
           / np.linalg.norm(np.asarray(spec_x)))
    assert rel < 0.05, f"relative spec error {rel}"
    assert np.isfinite(np.asarray(stop_q)).all()
    np.testing.assert_allclose(
        np.asarray(carry_q["att_state"]["weights"]).sum(-1), 16.0, rtol=1e-3)


def test_fused_int8_batch_blocking_consistent():
    """Row-wise activation quantization is per-example, so batch blocking
    must not change int8 results (dropout off)."""
    hp, variables, memory, mt, mask, carry, _ = _setup(batch=6)
    bundle = extract_decoder_bundle(variables, jnp.float32,
                                    quantize_gates=True)
    kwargs = dict(dropout_rate=0.0, zoneout_h=hp.zoneout_hidden,
                  zoneout_c=hp.zoneout_cell, interpret=True)
    rng = jax.random.PRNGKey(3)
    _, (s_full, _) = fused_decode_chunk(bundle, carry, memory, mt, mask,
                                        rng, 8, block_cap=128, **kwargs)
    _, (s_split, _) = fused_decode_chunk(bundle, carry, memory, mt, mask,
                                         rng, 8, block_cap=3, **kwargs)
    np.testing.assert_allclose(s_split, s_full, atol=1e-6)


def test_fused_int8_streams_short_text():
    """int8 memory/memory-transform streaming (MTTS_PALLAS_INT8_STREAMS
    opt-in): the per-channel mem dequant (folded past the t-reduction) and
    the per-a mts dequant row must track the f32 XLA scan within
    quantization noise on the single-fold layout."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup()
    rng = jax.random.PRNGKey(11)
    _, (spec_x, _) = dec_xla(variables, carry, memory, mt, mask,
                             rng, chunk_frames=16)
    bundle = extract_decoder_bundle(variables, jnp.float32,
                                    quantize_gates=True)
    _, (spec_q, stop_q) = fused_decode_chunk(
        bundle, carry, memory, mt, mask, rng, 16,
        dropout_rate=0.0, zoneout_h=hp.zoneout_hidden,
        zoneout_c=hp.zoneout_cell, block_cap=128, interpret=True,
        quantize_streams=True)
    rel = (np.linalg.norm(np.asarray(spec_q) - np.asarray(spec_x))
           / np.linalg.norm(np.asarray(spec_x)))
    assert rel < 0.05, f"relative spec error {rel}"
    assert np.isfinite(np.asarray(stop_q)).all()


def test_fused_int8_streams_blocked_long_text():
    """int8 streaming on the T-blocked layout (T > 256): the quantized
    memory/mt streams and the per-a mts dequant row must compose with the
    banded block windows."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup(
        batch=2, text_len=300)
    rng = jax.random.PRNGKey(7)
    carry_x, (spec_x, _) = dec_xla(variables, carry, memory, mt, mask,
                                   rng, chunk_frames=8)
    bundle = extract_decoder_bundle(variables, jnp.float32,
                                    quantize_gates=True)
    carry_q, (spec_q, stop_q) = fused_decode_chunk(
        bundle, carry, memory, mt, mask, rng, 8,
        dropout_rate=0.0, zoneout_h=hp.zoneout_hidden,
        zoneout_c=hp.zoneout_cell, block_cap=128, interpret=True,
        quantize_streams=True)
    assert carry_q["att_state"]["weights"].shape == (2, 300)
    rel = (np.linalg.norm(np.asarray(spec_q) - np.asarray(spec_x))
           / np.linalg.norm(np.asarray(spec_x)))
    assert rel < 0.05, f"relative spec error {rel}"
    assert np.isfinite(np.asarray(stop_q)).all()


@pytest.mark.parametrize("attention_type",
                         ["forward", "forward_transition_agent"])
def test_fused_forward_attention_matches_xla_scan(attention_type):
    """Round 3: the forward-attention family runs fused (reference
    modules/attention.py:89-156 — monotonic shift recurrence, unmasked
    softmax energy, masked clamp+renormalize; the transition agent's
    DNN-gated mix).  f32 interpret-mode parity vs the XLA scan, including
    the carried attention state (and t_prob)."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup(
        attention_type=attention_type)
    rng = jax.random.PRNGKey(42)

    carry_x, (spec_x, stop_x) = dec_xla(variables, carry, memory, mt, mask,
                                        rng, chunk_frames=4)
    carry_p, (spec_p, stop_p) = _fused(hp, variables, carry, memory, mt,
                                       mask, rng, chunk=4)
    np.testing.assert_allclose(spec_p, spec_x, atol=3e-5)
    np.testing.assert_allclose(stop_p, stop_x, atol=3e-5)
    np.testing.assert_allclose(carry_p["att_state"]["weights"],
                               carry_x["att_state"]["weights"], atol=3e-5)
    if attention_type == "forward_transition_agent":
        assert carry_p["att_state"]["t_prob"].shape == (6, 1)
        np.testing.assert_allclose(carry_p["att_state"]["t_prob"],
                                   carry_x["att_state"]["t_prob"],
                                   atol=3e-5)
    # forward weights are a normalized distribution every step
    np.testing.assert_allclose(
        np.asarray(carry_p["att_state"]["weights"]).sum(-1), 1.0, rtol=1e-5)

    # chunk chaining: fused carry into fused vs xla carry into xla
    k2 = jax.random.PRNGKey(7)
    _, (spec_x2, _) = dec_xla(variables, carry_x, memory, mt, mask, k2,
                              chunk_frames=4)
    _, (spec_p2, _) = _fused(hp, variables, carry_p, memory, mt, mask, k2,
                             chunk=4)
    np.testing.assert_allclose(spec_p2, spec_x2, atol=2e-4)


def test_fused_forward_attention_blocked_long_text():
    """Forward attention on the T-blocked layout (T=300 pads to 384): the
    kernel-internal padding must stay excluded from the unmasked softmax
    AND from the 1e-6 clamp floor (the XLA scan never sees those
    positions)."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup(
        batch=2, text_len=300, attention_type="forward")
    rng = jax.random.PRNGKey(5)
    carry_x, (spec_x, _) = dec_xla(variables, carry, memory, mt, mask,
                                   rng, chunk_frames=6)
    carry_p, (spec_p, _) = _fused(hp, variables, carry, memory, mt, mask,
                                  rng, chunk=6)
    assert carry_p["att_state"]["weights"].shape == (2, 300)
    np.testing.assert_allclose(spec_p, spec_x, atol=5e-5)
    np.testing.assert_allclose(carry_p["att_state"]["weights"],
                               carry_x["att_state"]["weights"], atol=5e-5)


def test_fused_prenet_depth_generalized():
    """Round 3: any prenet depth >= 1 runs fused (the reference always uses
    2; depth is an hp).  Parity at depths 1 and 3."""
    for depth in (1, 3):
        hp, variables, memory, mt, mask, carry, dec_xla = _setup(
            prenet_layers=depth)
        rng = jax.random.PRNGKey(11)
        _, (spec_x, _) = dec_xla(variables, carry, memory, mt, mask, rng,
                                 chunk_frames=4)
        _, (spec_p, _) = _fused(hp, variables, carry, memory, mt, mask,
                                rng, chunk=4)
        np.testing.assert_allclose(spec_p, spec_x, atol=3e-5,
                                   err_msg=f"prenet depth {depth}")


def test_fused_forward_int8_gates():
    """The W8A8 gate quant composes with the forward-attention kernel."""
    hp, variables, memory, mt, mask, carry, dec_xla = _setup(
        attention_type="forward_transition_agent")
    rng = jax.random.PRNGKey(13)
    _, (spec_x, _) = dec_xla(variables, carry, memory, mt, mask, rng,
                             chunk_frames=8)
    bundle = extract_decoder_bundle(variables, jnp.float32,
                                    quantize_gates=True)
    _, (spec_q, _) = fused_decode_chunk(
        bundle, carry, memory, mt, mask, rng, 8,
        dropout_rate=0.0, zoneout_h=hp.zoneout_hidden,
        zoneout_c=hp.zoneout_cell, block_cap=128, interpret=True)
    rel = (np.linalg.norm(np.asarray(spec_q) - np.asarray(spec_x))
           / np.linalg.norm(np.asarray(spec_x)))
    assert rel < 0.05, f"relative spec error {rel}"


def test_make_decode_fn_retrace_same_bucket():
    """Regression: one make_decode_fn closure driven by TWO separate jit
    wrappers at the SAME text-length bucket.  The closure caches the
    weight-derived energy operands per bucket; before the
    ensure_compile_time_eval fix the first trace stored TRACERS in that
    cache and the second wrapper's retrace died with
    UnexpectedTracerError (hit by tools/hw_validate_spill_recal.py when
    re-jitting one closure at two block caps)."""
    from multilingual_text_to_speech_tpu.ops.pallas_decoder import (
        make_decode_fn,
    )

    hp, variables, memory, mt, mask, carry, _ = _setup()
    hp.use_pallas_decoder = True
    fused = make_decode_fn(hp, variables, jnp.float32, interpret=True)
    rng = jax.random.PRNGKey(3)

    step1 = jax.jit(lambda c, m, t, k, r: fused(c, m, t, k, r, 2))
    _, (spec1, _) = step1(carry, memory, mt, mask, rng)
    # a distinct jit wrapper over the same closure retraces at the same
    # bucket and must see concrete cached operands, not stale tracers
    step2 = jax.jit(lambda c, m, t, k, r: fused(c, m, t, k, r, 2))
    _, (spec2, _) = step2(carry, memory, mt, mask, rng)
    np.testing.assert_array_equal(np.asarray(spec1), np.asarray(spec2))


def test_vmem_cap_hardware_validated_picks():
    """Pin the block caps of the four hardware-anchored serving cells so
    byte-model drift is caught off-device.  Anchors (flagship dims:
    mem=292, att=128, hidden=1024, 80 mels, prenet 256, chunk 128):

      * bf16 + int8 gates, T=128: cap >= 240 (single 240-row block — the
        bench config; decode_crossover_2026-08-19b.log);
      * bf16 + int8 gates, T=256: 240 rows must NOT fit (the 134 MB OOM
        that calibrated the quantized spill charge), while the re-run
        grid's 120-row pick must;
      * f32 unquantized, T=256: pick 24 validated bit-exact and 1.32x
        over the old 16 (unquant_t512_block60_2026-08-19.log), hardware
        fits 30 (spill_probe_f32_2026-08-19.log) — cap must sit in
        [24, 30];
      * bf16 unquantized, T=512: pick 60 validated bit-exact
        (unquant_t512_block60_2026-08-19.log) — cap in [60, 67] (the
        probe did not test past the model's 67).
    """
    from multilingual_text_to_speech_tpu.ops import pallas_decoder as pd

    dims = dict(mem_dim=292, att_dim=128, hidden=1024, mmel=80,
                prenet_dim=256, chunk=128)

    def cap(t_len, dtype, quantized):
        return pd._auto_block_cap(
            pd._padded_t(t_len), dims["mem_dim"], dims["att_dim"],
            dims["hidden"], dims["mmel"], dims["prenet_dim"],
            dims["chunk"], dtype, quantized=quantized)

    assert cap(128, jnp.bfloat16, True) >= 240
    c256q = cap(256, jnp.bfloat16, True)
    assert 120 <= c256q < 240, c256q
    c256f = cap(256, jnp.float32, False)
    assert 24 <= c256f <= 30, c256f
    c512u = cap(512, jnp.bfloat16, False)
    assert 60 <= c512u <= 67, c512u

    # chunk-256 throughput-serving cells (bench.py's shipped setting;
    # int8_c256_picks_2026-08-19.log validated both grown picks
    # bit-exact and faster, and chunk_ab_2026-08-19.log measured the
    # T=128 single 240-row block that the 3.77M frames/s number needs)
    def cap_c(t_len, chunk):
        return pd._auto_block_cap(
            pd._padded_t(t_len), dims["mem_dim"], dims["att_dim"],
            dims["hidden"], dims["mmel"], dims["prenet_dim"],
            chunk, jnp.bfloat16, quantized=True)

    assert cap_c(128, 256) >= 240
    c384 = cap_c(384, 256)
    assert 120 <= c384 < 240, c384
    c512 = cap_c(512, 256)
    assert 80 <= c512 < 120, c512
