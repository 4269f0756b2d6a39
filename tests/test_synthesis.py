"""Synthesis driver tests: language-spec mini-language, chunked decoding,
checkpoint->Synthesizer round trip, CLI smoke."""

import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multilingual_text_to_speech_tpu.config import HParams
from multilingual_text_to_speech_tpu.data import TextToSpeechDatasetCollection
from multilingual_text_to_speech_tpu.parallel import make_mesh
from multilingual_text_to_speech_tpu.synthesis import (
    Synthesizer,
    parse_language_spec,
)
from multilingual_text_to_speech_tpu.training import Trainer

from tests.corpus_utils import build_corpus_with_metafiles, tiny_model_hp


def spec_hp():
    hp = HParams()
    hp.languages = ["de", "fr", "zh"]
    hp.language_number = 3
    return hp


def test_parse_language_spec_simple():
    w = parse_language_spec("de", spec_hp(), 5)
    assert w.shape == (1, 5, 3)
    np.testing.assert_allclose(w[0, :, 0], 1.0)
    np.testing.assert_allclose(w[0, :, 1:], 0.0)


def test_parse_language_spec_segments():
    # "de-10,fr-9,de": first 10 chars de, next 9 fr, rest de
    w = parse_language_spec("de-2,fr-3,de", spec_hp(), 7)
    assert w.shape == (1, 7, 3)
    np.testing.assert_allclose(w[0, :2, 0], 1.0)
    np.testing.assert_allclose(w[0, 2:5, 1], 1.0)
    np.testing.assert_allclose(w[0, 5:, 0], 1.0)


def test_parse_language_spec_bad_lengths():
    # under-covering spec: last segment should take the remainder
    with pytest.raises(ValueError, match="covers 5 of 7"):
        parse_language_spec("de-2,fr-3", spec_hp(), 7)
    # over-long spec must fail loudly, not broadcast-error downstream
    with pytest.raises(ValueError, match="only 4"):
        parse_language_spec("de-3,fr-9,de", spec_hp(), 4)


def test_parse_language_spec_blend():
    w = parse_language_spec("de-1,fr*0.75:zh*0.25-2,de", spec_hp(), 4)
    np.testing.assert_allclose(w[0, 0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(w[0, 1], [0.0, 0.75, 0.25])
    np.testing.assert_allclose(w[0, 2], [0.0, 0.75, 0.25])
    np.testing.assert_allclose(w[0, 3], [1.0, 0.0, 0.0])


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    """Train a tiny model briefly and save a checkpoint."""
    root = str(tmp_path_factory.mktemp("corpus"))
    hp = tiny_model_hp(
        languages=["german", "french"],
        multi_language=True,
        multi_speaker=True,
        speaker_embedding_dimension=4,
        language_embedding_dimension=2,
        encoder_type="generated",
        balanced_sampling=True,
        perfect_sampling=True,
        batch_size=4,
        case_sensitive=False,
        decode_chunk_frames=16,
        max_output_length=64,
    )
    build_corpus_with_metafiles(root, hp, n_per_lang=4)
    data = TextToSpeechDatasetCollection(root, hp)
    mesh = make_mesh(devices=jax.devices()[:1])
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    trainer = Trainer(hp, data, checkpoint_dir=ckpt_dir, mesh=mesh, seed=0)
    trainer.train_epoch()
    path = trainer.save(1.0)
    return path, hp


def test_synthesizer_from_checkpoint(trained_checkpoint):
    path, hp = trained_checkpoint
    synth = Synthesizer.from_checkpoint(path, max_chunks=3)
    # hp embedded in the checkpoint is self-contained
    assert synth.hp.languages == ["german", "french"]
    assert synth.hp.unique_speakers == ["french", "german"]

    spec = synth.synthesize_line("01|hallo welt|german|german")
    assert spec.shape[0] == hp.num_mels   # [bins, F] reference layout
    assert spec.shape[1] >= 1
    assert np.isfinite(spec).all()


def test_synthesizer_code_switching(trained_checkpoint):
    path, _ = trained_checkpoint
    synth = Synthesizer.from_checkpoint(path, max_chunks=2)
    spec = synth.synthesize_line(
        "02|hallo welt|german|german-5,french*0.7:german*0.3-4,german"
    )
    assert np.isfinite(spec).all()


def test_synthesizer_vocode(trained_checkpoint):
    path, _ = trained_checkpoint
    synth = Synthesizer.from_checkpoint(path, max_chunks=2)
    spec = synth.synthesize_line("03|hallo|german|german")
    wav = synth.vocode(spec)
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()


def test_cli_synthesize_smoke(trained_checkpoint, tmp_path, monkeypatch):
    from multilingual_text_to_speech_tpu.cli import synthesize as cli

    path, _ = trained_checkpoint
    out = str(tmp_path / "out")
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("07|hallo welt|german|german\n")
    )
    cli.main(["--checkpoint", path, "--output", out, "--save_spec"])
    assert os.path.exists(os.path.join(out, "07.npy"))
    assert os.path.exists(os.path.join(out, "07.wav"))
    spec = np.load(os.path.join(out, "07.npy"))
    assert spec.shape[0] == 20  # num_mels, reference layout


def test_cli_gta_smoke(trained_checkpoint, tmp_path, monkeypatch, tmp_path_factory):
    # gta needs data_root/<dataset>/train.txt; rebuild dataset layout
    from multilingual_text_to_speech_tpu.cli import gta as cli

    path, hp = trained_checkpoint
    # corpus root was created under the dataset name 'ljspeech' default; use
    # a dedicated layout: data_root/<hp.dataset>
    root = str(tmp_path / "data" / hp.dataset)
    os.makedirs(root, exist_ok=True)
    build_corpus_with_metafiles(root, hp.copy(), n_per_lang=2, val_every=4)

    out = str(tmp_path / "gta_out")
    cli.main([
        "--checkpoint", path, "--output", out,
        "--data_root", str(tmp_path / "data"), "--batch_size", "2",
    ])
    files = os.listdir(out)
    assert len(files) >= 1
    mel = np.load(os.path.join(out, sorted(files)[0]))
    assert mel.shape[0] == 20


def test_synthesizer_batched(trained_checkpoint):
    """Batched synthesis matches the per-line path's shapes and crops each
    sample at its own stop."""
    path, hp = trained_checkpoint
    synth = Synthesizer.from_checkpoint(path, max_chunks=3)
    lines = [
        "b1|hallo welt|german|german",
        "b2|guten tag wie geht|french|french-7,german",
        "b3|danke|german|german*0.5:french*0.5",
    ]
    specs = synth.synthesize_batch_lines(lines)
    assert len(specs) == 3
    for spec in specs:
        assert spec.shape[0] == hp.num_mels
        assert spec.shape[1] >= 1
        assert np.isfinite(spec).all()


def test_cli_synthesize_batched(trained_checkpoint, tmp_path, monkeypatch):
    from multilingual_text_to_speech_tpu.cli import synthesize as cli

    path, _ = trained_checkpoint
    out = str(tmp_path / "out_b")
    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO("x1|hallo welt|german|german\n"
                    "x2|guten tag|french|french\n"),
    )
    cli.main(["--checkpoint", path, "--output", out, "--save_spec",
              "--ignore_wav", "--batch_size", "2"])
    assert os.path.exists(os.path.join(out, "x1.npy"))
    assert os.path.exists(os.path.join(out, "x2.npy"))


def test_parse_language_spec_errors():
    hp = spec_hp()
    with pytest.raises(ValueError, match="unknown language 'xx'"):
        parse_language_spec("xx", hp, 5)
    with pytest.raises(ValueError, match="covers 3 of 5"):
        parse_language_spec("de-1,fr-2", hp, 5)


def test_unknown_speaker_error(trained_checkpoint):
    path, _ = trained_checkpoint
    synth = Synthesizer.from_checkpoint(path, max_chunks=1)
    with pytest.raises(ValueError, match="unknown speaker 'NOPE'"):
        synth.synthesize_line("e|hallo|NOPE|german")


def test_synthesizer_pallas_decoder_wrapper(trained_checkpoint, monkeypatch):
    """The fused-decoder wrapper (synthesis._build_decode_chunk) and its
    long-text XLA fallback, driven through the Synthesizer on the CPU test
    backend via MTTS_PALLAS_DECODER=interpret.

    With prenet dropout disabled both decode implementations are
    deterministic and must agree on the produced spectrogram."""
    from multilingual_text_to_speech_tpu.ops import pallas_decoder

    path, _ = trained_checkpoint
    base = Synthesizer.from_checkpoint(path, max_chunks=2)
    hp, variables = base.hp, base.variables
    hp.dropout = 0.0
    # exact-parity test: pin the (default-on) lossy int8 serving mode off
    hp.pallas_decoder_int8 = False
    assert pallas_decoder.supports(hp)

    monkeypatch.setenv("MTTS_PALLAS_DECODER", "interpret")
    fused_synth = Synthesizer(hp, variables, max_chunks=2)
    monkeypatch.setenv("MTTS_PALLAS_DECODER", "off")
    xla_synth = Synthesizer(hp, variables, max_chunks=2)
    # the wrapper (not the bare jitted XLA fn) is installed on the fused one
    assert fused_synth._decode_chunk.__name__ == "decode"
    assert fused_synth._decode_chunk is not xla_synth._decode_chunk

    line = "p1|hallo welt|german|german"
    fused_spec = fused_synth.synthesize_line(line)
    xla_spec = xla_synth.synthesize_line(line)
    assert fused_spec.shape == xla_spec.shape
    # step-level parity is pinned tightly in tests/test_pallas_decoder.py;
    # across chained AR chunks the folded-matmul reassociation compounds
    # through the feedback loop, so the end-to-end check is coarser
    np.testing.assert_allclose(fused_spec, xla_spec, atol=0.05)

    # long text: memory outgrows the kernel's VMEM budget -> the wrapper
    # must route to the XLA scan (pallas_decoder.supports_shapes gate)
    long_text = " ".join(["hallo welt"] * 60)
    assert len(long_text) > pallas_decoder._MAX_MEMORY_LEN
    long_spec = fused_synth.synthesize_line(f"p2|{long_text}|german|german")
    assert np.isfinite(long_spec).all()


def test_synthesizer_row_group_batch_matches_mixing(trained_checkpoint):
    """All-one-hot batches take the row-group encode path (language-sorted,
    padded runs, each sample through only its own language's encoder); the
    result must match the accent-mixing path, which a no-op fractional blend
    forces."""
    path, hp = trained_checkpoint
    synth = Synthesizer.from_checkpoint(path, max_chunks=3)
    texts = ["hallo welt", "guten tag wie geht", "danke", "bitte sehr", "ja"]
    langs = ["german", "french", "german", "german", "french"]  # unbalanced
    spks = ["german", "french", "german", "german", "french"]
    pure_lines = [f"p{i}|{t}|{s}|{l}"
                  for i, (t, s, l) in enumerate(zip(texts, spks, langs))]
    # "<lang>*1.0:<other>*0.0" parses as a blend -> full mixing path
    other = {"german": "french", "french": "german"}
    blend_lines = [f"p{i}|{t}|{s}|{l}*1.0:{other[l]}*0.0"
                   for i, (t, s, l) in enumerate(zip(texts, spks, langs))]

    rg = synth.synthesize_batch_lines(pure_lines)
    mix = synth.synthesize_batch_lines(blend_lines)
    assert len(rg) == len(mix) == len(texts)
    for a, b in zip(rg, mix):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_plan_row_groups():
    from multilingual_text_to_speech_tpu.synthesis import _plan_row_groups

    # balanced counts pick a large row-group size with zero padding
    langs = [0] * 48 + [1] * 48 + [2] * 48
    slots, group_langs, bp = _plan_row_groups(langs)
    assert bp == 48 and len(slots) == 144
    assert None not in slots
    assert group_langs == [0, 1, 2]

    # unbalanced counts fall back to smaller groups within 12.5% overhead
    langs = [0] * 5 + [1] * 2
    slots, group_langs, bp = _plan_row_groups(langs)
    assert len(slots) % bp == 0
    assert len(slots) <= int(7 * 1.125) or bp == 1
    # every row group is language-uniform and matches its group_langs entry
    rows = len(slots) // len(group_langs)
    for r, lang in enumerate(group_langs):
        for s in slots[r * rows:(r + 1) * rows]:
            if s is not None:
                assert langs[s] == lang
    # all original indices appear exactly once
    real = [s for s in slots if s is not None]
    assert sorted(real) == list(range(7))

    # monolingual run: overhead stays under the 12.5% cap
    slots, group_langs, bp = _plan_row_groups([3] * 30)
    assert set(group_langs) == {3}
    assert len(slots) <= int(30 * 1.125)
    assert sorted(s for s in slots if s is not None) == list(range(30))


def test_synthesizer_fused_forward_attention(monkeypatch):
    """Round 3: the fused serving kernel covers the forward-attention
    family end-to-end through the Synthesizer (carry threading includes
    t_prob for the transition agent); fused (interpret) and XLA-scan
    synthesis must agree with dropout disabled."""
    from tests.corpus_utils import tiny_model_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.ops import pallas_decoder

    hp = tiny_model_hp(
        languages=["german", "french"], multi_language=True,
        multi_speaker=True, speaker_embedding_dimension=4,
        language_embedding_dimension=2,
        attention_type="forward_transition_agent",
        decode_chunk_frames=8, max_output_length=24, dropout=0.0,
    )
    hp.language_number = 2
    hp.speaker_number = 2
    hp.unique_speakers = ["a", "b"]
    hp.mel_normalize_mean = [0.0] * hp.num_mels
    hp.mel_normalize_variance = [1.0] * hp.num_mels
    assert pallas_decoder.supports(hp)

    model = Tacotron(hp, train=False)
    b, t = 2, hp.bucket_text_multiple
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((b, t), jnp.int32),
        jnp.full((b,), t), jnp.zeros((b, 16, hp.num_mels)),
        jnp.full((b,), 16), jnp.zeros((b,), jnp.int32),
        jnp.arange(b, dtype=jnp.int32), 0.0, jax.random.PRNGKey(0))

    line = "f1|hallo welt|a|german"
    monkeypatch.setenv("MTTS_PALLAS_DECODER", "interpret")
    fused_synth = Synthesizer(hp, variables, max_chunks=2)
    assert fused_synth._decode_chunk.__name__ == "decode"
    fused_spec = fused_synth.synthesize_line(line)

    monkeypatch.setenv("MTTS_PALLAS_DECODER", "off")
    xla_spec = Synthesizer(hp, variables, max_chunks=2).synthesize_line(line)
    assert fused_spec.shape == xla_spec.shape
    # both paths run bf16 (Synthesizer compute dtype); chained AR chunks on
    # an untrained random net amplify the reassociation noise — same coarse
    # bound as the location-sensitive wrapper test above
    np.testing.assert_allclose(fused_spec, xla_spec, atol=0.02)
