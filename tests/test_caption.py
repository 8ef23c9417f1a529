"""S2VT captioning stack: vocab, data, model, beam search, BLEU, training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct.caption.bleu import _native_sentence_bleu, sentence_bleu
from vct.caption.data import encode_caption, preprocess_annotations
from vct.caption.vocab import Vocabulary, tokenize_caption
from vct.core.config import CaptionConfig


def _vocab():
    v = Vocabulary(freq_threshold=1)
    v.build_vocabulary(["a man is cooking", "a dog runs fast", "a man runs"])
    return v


def test_vocab_specials_and_roundtrip():
    v = _vocab()
    assert v["<pad>"] == 0 and v["<start>"] == 1 and v["<end>"] == 2 and v["<unk>"] == 3
    ids = v.numericalize(["a", "man", "zebra"])
    assert ids[2] == v["<unk>"]
    assert v.denumericalize(ids[:2]) == ["a", "man"]


def test_vocab_freq_threshold():
    v = Vocabulary(freq_threshold=2)
    v.build_vocabulary(["a man", "a dog"])
    assert "a" in v.word2idx and "man" not in v.word2idx


def test_vocab_persistence(tmp_path):
    v = _vocab()
    p = str(tmp_path / "vocab.json")
    v.save(p)
    v2 = Vocabulary.load(p)
    assert v2.word2idx == v.word2idx


def test_tokenize_strips_punctuation():
    assert tokenize_caption("A man, cooking!") == ["a", "man", "cooking"]


def test_vocab_build_uses_encode_tokenization():
    """Capitalized/punctuated captions must resolve to real ids, not <unk>
    (the reference builds from raw split() and encodes lowercased —
    beam_search.py:55-66 vs :119-128 — so its vocab is unreachable)."""
    v = Vocabulary()
    v.build_vocabulary(["A man is playing Guitar."])
    ids = v.numericalize(tokenize_caption("A man is playing Guitar."))
    assert v["<unk>"] not in ids
    assert "Guitar." not in v.word2idx and "guitar" in v.word2idx


def test_preprocess_annotations_deterministic_order(tmp_path):
    """Unique-caption order is first-appearance, not set() hash order — the
    vocab ids a resume process rebuilds must match the original run's."""
    from vct.caption.data import preprocess_annotations

    p = tmp_path / "ann.txt"
    p.write_text("v1.mp4 b cap\nv2.mp4 a cap\nv3.mp4 b cap\nv4.mp4 c cap\n")
    _, sentences = preprocess_annotations(str(p))
    assert sentences == ["b cap", "a cap", "c cap"]


def test_annotation_parser(tmp_path):
    p = tmp_path / "ann.txt"
    p.write_text("vid1 a man is cooking\n\nvid2 a dog runs\nbadline\n")
    anns, sents = preprocess_annotations(str(p))
    assert anns == [("vid1", "a man is cooking"), ("vid2", "a dog runs")]
    assert set(sents) == {"a man is cooking", "a dog runs"}


def test_encode_caption_pads_and_truncates():
    v = _vocab()
    ids = encode_caption("a man is cooking", v, 10)
    assert ids[0] == v["<start>"]
    assert v["<end>"] in ids
    assert len(ids) == 10 and ids[-1] == v["<pad>"]
    short = encode_caption("a man is cooking a dog runs fast", v, 4)
    assert len(short) == 4


def test_bleu_native_matches_nltk():
    nltk = pytest.importorskip("nltk")
    del nltk
    refs = [["a", "man", "is", "cooking", "food"]]
    hyp = ["a", "man", "is", "cooking", "rice"]
    assert _native_sentence_bleu(refs, hyp) == pytest.approx(
        sentence_bleu(refs, hyp), abs=1e-9
    )
    assert _native_sentence_bleu(refs, refs[0]) == pytest.approx(1.0)


@pytest.fixture(scope="module")
def tiny_setup():
    v = _vocab()
    cfg = CaptionConfig(
        cnn_backbone="resnet18", cnn_output_size=16, hidden_size=16,
        num_frames=3, max_caption_len=6, epochs=2, beam_width=3,
        learning_rate=3e-3,
    )
    from vct.caption.train import CaptionTrainer

    trainer = CaptionTrainer(cfg, v)
    rng = np.random.RandomState(0)
    videos = rng.rand(4, 3, 32, 32, 3).astype(np.float32)
    captions = np.stack([
        encode_caption("a man is cooking", v, 6),
        encode_caption("a dog runs fast", v, 6),
        encode_caption("a man runs", v, 6),
        encode_caption("a dog runs", v, 6),
    ])
    state = trainer.init_state(jax.random.PRNGKey(0), videos, captions)
    return trainer, state, videos, captions, v


def test_model_forward_shapes(tiny_setup):
    trainer, state, videos, captions, v = tiny_setup
    variables = {"params": state.params, **state.extra_vars}
    logp = trainer.model.apply(variables, jnp.asarray(videos), jnp.asarray(captions))
    assert logp.shape == (4, 6, len(v))
    # log-probs normalize
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, atol=1e-4
    )


def test_caption_feature_cache_identical_loss_trajectory(tmp_path, capsys):
    """caption.feature_cache: frozen-backbone features extracted once,
    fc/encoder/decoder trained from the block — per-epoch losses must EQUAL
    the raw-clip path (bit-constant features, same shuffle stream)."""
    from vct.caption.train import CaptionTrainer

    v = _vocab()
    rng = np.random.RandomState(0)
    # 24x24 matches the tiny-captioner geometry used across the caption
    # test modules, so the backbone compile hits the persistent XLA cache
    videos = rng.rand(4, 3, 24, 24, 3).astype(np.float32)
    captions = np.stack([
        encode_caption("a man is cooking", v, 6),
        encode_caption("a dog runs fast", v, 6),
        encode_caption("a man runs", v, 6),
        encode_caption("a dog runs", v, 6),
    ])
    losses = {}
    for flag in (False, True):
        cfg = CaptionConfig(
            cnn_backbone="resnet18", cnn_output_size=16, hidden_size=16,
            num_frames=3, max_caption_len=6, epochs=2, learning_rate=3e-3,
            dropout=0.0, feature_cache=flag,
            checkpoint_dir=str(tmp_path / f"ck{flag}"),
        )
        trainer = CaptionTrainer(cfg, v)
        state = trainer.init_state(jax.random.PRNGKey(0), videos, captions)
        _, losses[flag] = trainer.fit(
            state, videos, captions, batch_size=2,
            checkpoint_dir=cfg.checkpoint_dir, log=True,
            val=(videos[:2], captions[:2]),
        )
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5,
                               atol=1e-6)
    assert "feature_cache: extracted" in capsys.readouterr().out


@pytest.mark.slow
def test_1s2vt_variant_trains_and_restores(tmp_path):
    """The 1s2vt multi-layer model (caption.encoder_layers,
    1s2vt_models.py:233,301) through the full trainer: loss decreases, the
    checkpoint manifest records the depth, and restore rebuilds the same
    architecture (multi-layer decoder params present, decode runs)."""
    from vct.caption.train import CaptionTrainer, restore_caption_trainer

    v = _vocab()
    cfg = CaptionConfig(
        cnn_backbone="resnet18", cnn_output_size=16, hidden_size=16,
        num_frames=3, max_caption_len=6, epochs=2, beam_width=2,
        learning_rate=3e-3, encoder_layers=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    trainer = CaptionTrainer(cfg, v)
    rng = np.random.RandomState(0)
    videos = rng.rand(4, 3, 32, 32, 3).astype(np.float32)
    captions = np.stack([
        encode_caption("a man is cooking", v, 6),
        encode_caption("a dog runs fast", v, 6),
        encode_caption("a man runs", v, 6),
        encode_caption("a dog runs", v, 6),
    ])
    state = trainer.init_state(jax.random.PRNGKey(0), videos, captions)
    assert "gru_w_ih_l1" in state.params["decoder"]  # stacked decoder
    state, losses = trainer.fit(
        state, videos, captions, batch_size=2,
        checkpoint_dir=cfg.checkpoint_dir, log=False,
    )
    assert losses[-1] < losses[0]
    trainer2, state2, cfg2 = restore_caption_trainer(
        cfg.checkpoint_dir, height=32, width=32
    )
    assert cfg2.encoder_layers == 2
    words = trainer2.caption_videos(state2, videos[:1])
    assert isinstance(words[0], list)


@pytest.mark.slow
def test_teacher_forced_training_reduces_loss(tiny_setup, tmp_path):
    trainer, _, videos, captions, _ = tiny_setup
    # fresh state: fit() donates its input state buffers
    state = trainer.init_state(jax.random.PRNGKey(1), videos, captions)
    state2, losses = trainer.fit(
        state, videos, captions, batch_size=2,
        checkpoint_dir=str(tmp_path / "ck"), log=False,
    )
    assert losses[-1] < losses[0]
    # resume: restarting fit with the same dir trains nothing further and
    # returns the restored full history (engine discipline: a resumed run's
    # losses cover the whole run).
    state3, losses2 = trainer.fit(
        state2, videos, captions, batch_size=2,
        checkpoint_dir=str(tmp_path / "ck"), log=False,
    )
    assert losses2 == pytest.approx(losses)


def test_greedy_and_beam_decode(tiny_setup):
    trainer, state, videos, _, v = tiny_setup
    greedy = trainer.caption_videos(state, videos[:2], beam_width=1)
    assert len(greedy) == 2
    beam = trainer.caption_videos(state, videos[:2], beam_width=3)
    assert len(beam) == 2
    for caption in greedy + beam:
        assert all(w in v.word2idx for w in caption)
        assert len(caption) <= trainer.cfg.max_caption_len


def test_beam_width_one_matches_greedy(tiny_setup):
    """K=1 beam search must equal greedy argmax decoding."""
    trainer, state, videos, _, _ = tiny_setup
    greedy = trainer.caption_videos(state, videos[:2], beam_width=1)
    beam1 = []
    from vct.caption.beam import beam_search, decode_tokens

    variables = {"params": state.params, **state.extra_vars}
    tokens, _ = beam_search(
        trainer.model, variables, jnp.asarray(videos[:2]),
        beam_width=1, max_len=trainer.cfg.max_caption_len,
    )
    beam1 = [decode_tokens(row, trainer.vocab) for row in np.asarray(tokens)]
    assert beam1 == greedy


def test_beam_scores_descend_with_width(tiny_setup):
    """Wider beams can only find equal-or-better sequence scores."""
    from vct.caption.beam import beam_search

    trainer, state, videos, _, _ = tiny_setup
    variables = {"params": state.params, **state.extra_vars}
    _, s1 = beam_search(trainer.model, variables, jnp.asarray(videos[:2]),
                        beam_width=1, max_len=6)
    _, s3 = beam_search(trainer.model, variables, jnp.asarray(videos[:2]),
                        beam_width=3, max_len=6)
    assert np.all(np.asarray(s3) >= np.asarray(s1) - 1e-4)


def test_evaluate_bleu_prints_contract(tiny_setup, capsys):
    trainer, state, videos, _, _ = tiny_setup
    refs = [[["a", "man", "is", "cooking"]], [["a", "dog", "runs", "fast"]]]
    score = trainer.evaluate_bleu(state, videos[:2], refs)
    out = capsys.readouterr().out
    assert "Average BLEU score:" in out
    assert 0.0 <= score <= 1.0
