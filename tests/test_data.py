"""Input-pipeline tests: determinism, resumability, sharding partition,
prefetch (SURVEY.md §5 checkpoint/resume + §7 multi-host determinism)."""

import numpy as np

from pwn_tpu.config import get_config, override
from pwn_tpu.data import SyntheticTones, WavCropDataset, make_train_iterator, prefetch
from pwn_tpu.utils.audio_io import write_wav

CFG = override(get_config("tiny_teacher"), "train.crop_samples", 512)


def test_synthetic_tones_deterministic():
    ds = SyntheticTones(4, 1000, 16000, seed=5)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(ds[0], ds[1])
    assert np.abs(a).max() <= 1.0


def test_iterator_shapes_and_determinism():
    ds = SyntheticTones(6, 2000, 16000)
    it1 = make_train_iterator(ds, CFG, 3, seed=7)
    it2 = make_train_iterator(ds, CFG, 3, seed=7)
    b1, b2 = next(it1), next(it2)
    assert b1.shape == (3, 512) and b1.dtype == np.float32
    np.testing.assert_array_equal(b1, b2)


def test_iterator_resume_exact():
    """start_step fast-forwards the stream exactly (checkpoint resume)."""
    ds = SyntheticTones(6, 2000, 16000)
    it = make_train_iterator(ds, CFG, 2, seed=9)
    stream = [next(it) for _ in range(5)]
    resumed = make_train_iterator(ds, CFG, 2, seed=9, start_step=3)
    np.testing.assert_array_equal(next(resumed), stream[3])
    np.testing.assert_array_equal(next(resumed), stream[4])


def test_short_clip_padding():
    ds = SyntheticTones(2, 100, 16000)  # shorter than crop
    it = make_train_iterator(ds, CFG, 2, seed=1)
    b = next(it)
    assert b.shape == (2, 512)
    np.testing.assert_array_equal(b[:, 100:], 0.0)


def test_wav_dir_dataset_and_host_sharding(tmp_path):
    for i in range(6):
        write_wav(
            str(tmp_path / f"clip_{i}.wav"),
            np.random.default_rng(i).uniform(-0.3, 0.3, 1500).astype(
                np.float32
            ),
            16000,
        )
    full = WavCropDataset(str(tmp_path), 16000)
    assert len(full) == 6
    h0 = WavCropDataset(str(tmp_path), 16000, process_index=0,
                        process_count=2)
    h1 = WavCropDataset(str(tmp_path), 16000, process_index=1,
                        process_count=2)
    assert len(h0) == 3 and len(h1) == 3
    assert set(h0.paths).isdisjoint(h1.paths)
    assert set(h0.paths) | set(h1.paths) == set(full.paths)
    wav = full[0]
    assert wav.dtype == np.float32 and len(wav) == 1500


def test_prefetch_passthrough_and_error_propagation():
    ds = SyntheticTones(4, 2000, 16000)
    it = make_train_iterator(ds, CFG, 2, seed=2)
    pf = prefetch(it, put=lambda x: x * 2.0, depth=2)
    direct = make_train_iterator(ds, CFG, 2, seed=2)
    for _ in range(3):
        np.testing.assert_array_equal(next(pf), next(direct) * 2.0)

    def boom():
        yield np.zeros(3)
        raise RuntimeError("loader died")

    pf2 = prefetch(boom(), put=lambda x: x)
    next(pf2)
    import pytest

    with pytest.raises(RuntimeError, match="loader died"):
        next(pf2)


def test_grain_pipeline_deterministic_and_resumable():
    """grain engine (SURVEY T3 substrate): determinism + exact resume."""
    from pwn_tpu.data.grain_pipeline import make_grain_iterator

    ds = SyntheticTones(6, 2000, 16000)
    it = make_grain_iterator(ds, CFG, 3, seed=5)
    stream = [next(it) for _ in range(4)]
    assert stream[0].shape == (3, 512)
    assert stream[0].dtype == np.float32
    it2 = make_grain_iterator(ds, CFG, 3, seed=5)
    np.testing.assert_array_equal(next(it2), stream[0])
    it3 = make_grain_iterator(ds, CFG, 3, seed=5, start_step=3)
    np.testing.assert_array_equal(next(it3), stream[3])
    it4 = make_grain_iterator(ds, CFG, 3, seed=6)
    assert not np.array_equal(next(it4), stream[0])


def test_grain_engine_in_training_loop(tmp_path):
    from pwn_tpu.config import get_config, override
    from pwn_tpu.training.loop import run_teacher_training

    cfg = get_config("tiny_teacher")
    for k, v in {
        "train.crop_samples": 1024,
        "train.global_batch_size": 8,
        "train.data_engine": "grain",
        "train.log_every": 1,
        "train.checkpoint_every": 100,
    }.items():
        cfg = override(cfg, k, v)
    res = run_teacher_training(cfg, workdir=str(tmp_path / "g"),
                               num_steps=2)
    assert res.steps_run == 2
    assert np.isfinite(res.final_metrics["loss"])


def test_grain_multiworker_stream_identical():
    """grain mp_prefetch workers must not change the batch stream (all
    randomness is index-keyed; workers are pure transport)."""
    from pwn_tpu.data.grain_pipeline import make_grain_iterator
    from pwn_tpu.data import SyntheticTones

    ds = SyntheticTones(8, 4000, CFG.dsp.sample_rate)
    it0 = make_grain_iterator(ds, CFG, 2, seed=5, num_workers=0)
    ref = [next(it0) for _ in range(3)]
    it2 = make_grain_iterator(ds, CFG, 2, seed=5, num_workers=2)
    for r in ref:
        np.testing.assert_array_equal(next(it2), r)


def test_synthetic_speech_corpus():
    """Speech-like corpus: deterministic, normalized, and spectrally
    richer than harmonic tones (energy above 2 kHz from fricatives,
    plus silences) — VERDICT r1 missing item 4."""
    from pwn_tpu.data import SyntheticSpeech

    sr = 16000
    ds = SyntheticSpeech(4, sr, sr, seed=3)
    a = ds[0]
    np.testing.assert_array_equal(a, SyntheticSpeech(4, sr, sr, seed=3)[0])
    assert not np.array_equal(a, ds[1])
    assert a.dtype == np.float32 and len(a) == sr
    assert np.isfinite(a).all() and np.abs(a).max() <= 0.7 + 1e-6

    # aggregate spectrum over a few clips: meaningful high-band energy
    spec = np.zeros(sr // 2)
    frac_silence = 0.0
    for i in range(4):
        x = ds[i]
        spec += np.abs(np.fft.rfft(x))[: sr // 2]
        frac_silence += float(np.mean(np.abs(x) < 1e-4)) / 4
    freqs = np.fft.rfftfreq(sr, 1 / sr)[: sr // 2]
    high = spec[freqs > 2000].sum()
    total = spec.sum()
    assert high / total > 0.02, high / total  # tones have ~none up there
    assert frac_silence > 0.01  # real pauses exist


def test_wav_crop_dataset_cache_lru(tmp_path):
    """The decode cache is byte-capped LRU: items evict oldest-first and
    reads stay correct regardless of the budget."""
    import numpy as np

    from pwn_tpu.data.pipeline import WavCropDataset
    from pwn_tpu.utils.audio_io import write_wav

    sr = 16000
    rng = np.random.default_rng(0)
    clips = []
    for i in range(4):
        w = rng.uniform(-0.5, 0.5, 1000).astype(np.float32)
        write_wav(str(tmp_path / f"c{i}.wav"), w, sr)
        clips.append(w)

    # budget of ~2 clips (1000 float32 = 4000 B each)
    ds = WavCropDataset(str(tmp_path), sr, cache_bytes=9000)
    ref = [np.asarray(ds[i]) for i in range(4)]
    assert len(ds._cache) == 2 and ds._cache_size <= 9000
    # re-reads of evicted items still correct
    for i in range(4):
        np.testing.assert_allclose(np.asarray(ds[i]), ref[i])

    # zero budget: nothing cached, reads still work
    ds0 = WavCropDataset(str(tmp_path), sr, cache_bytes=0)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(ds0[i]), ref[i])
    assert len(ds0._cache) == 0
