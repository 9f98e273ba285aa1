"""Waveform augmentation tests: per-transform semantics + chain output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import SAMPLE_RATE, WaveAugParams
from audio_few_shot_learning_tpu.ops.waveaugment import (
    WaveAugment,
    add_colored_noise,
    bandstop,
    gain,
    highpass,
    highpass_bandstop,
    lowpass,
    noise_highpass_bandstop,
    pitch_shift,
    shift,
    splice_out,
    time_inversion,
    time_masking,
    time_stretch,
)

SR = SAMPLE_RATE
L = SR  # 1 s test signals


def _tone(freq, b=2):
    t = np.arange(L) / SR
    return jnp.asarray(np.tile(np.sin(2 * np.pi * freq * t, dtype=np.float32), (b, 1)))


def _band_energy(x, lo, hi):
    spec = np.abs(np.fft.rfft(np.asarray(x), axis=-1)) ** 2
    f = np.fft.rfftfreq(x.shape[-1], 1 / SR)
    return spec[:, (f >= lo) & (f < hi)].sum(axis=-1)


def test_lowpass_attenuates_high_band(rng):
    x = _tone(6000)
    y = lowpass(x, rng, 1000.0, 1500.0, p=1.0)
    assert (_band_energy(y, 5500, 6500) < 0.01 * _band_energy(x, 5500, 6500)).all()


def test_highpass_attenuates_low_band(rng):
    x = _tone(200)
    y = highpass(x, rng, 2000.0, 3000.0, p=1.0)
    assert (_band_energy(y, 100, 300) < 0.01 * _band_energy(x, 100, 300)).all()


def test_bandstop_notches_center(rng):
    x = _tone(1000) + _tone(4000)
    y = bandstop(x, rng, 1000.0, 1000.0, 0.5, 0.5, p=1.0)
    # 1 kHz suppressed, 4 kHz roughly preserved
    assert (_band_energy(y, 900, 1100) < 0.2 * _band_energy(x, 900, 1100)).all()
    assert (_band_energy(y, 3900, 4100) > 0.5 * _band_energy(x, 3900, 4100)).all()


def test_gain_scales(rng):
    x = _tone(440)
    y = gain(x, rng, 6.0, 6.0, p=1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 10 ** (6 / 20), rtol=1e-4)


def test_probability_zero_is_identity(rng):
    x = _tone(440)
    for fn in (
        lambda: lowpass(x, rng, 500.0, 600.0, p=0.0),
        lambda: gain(x, rng, 6.0, 6.0, p=0.0),
        lambda: time_inversion(x, rng, p=0.0),
        lambda: splice_out(x, rng, 4, 100, p=0.0),
    ):
        np.testing.assert_array_equal(np.asarray(fn()), np.asarray(x))


def test_time_inversion(rng):
    x = jnp.asarray(np.arange(2 * L, dtype=np.float32).reshape(2, L))
    y = time_inversion(x, rng, p=1.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[:, ::-1])


def test_shift_rollover(rng):
    x = jnp.asarray(np.arange(2 * L, dtype=np.float32).reshape(2, L))
    y = np.asarray(shift(x, rng, 0.25, 0.25, p=1.0))
    np.testing.assert_array_equal(y[0], np.roll(np.asarray(x[0]), L // 4))


def test_colored_noise_snr(rng):
    x = _tone(440)
    y = add_colored_noise(x, rng, 10.0, 10.0, 0.0, 0.0, p=1.0)
    noise = np.asarray(y - x)
    sig_rms = np.sqrt((np.asarray(x) ** 2).mean(axis=-1))
    noise_rms = np.sqrt((noise**2).mean(axis=-1))
    snr_db = 20 * np.log10(sig_rms / noise_rms)
    np.testing.assert_allclose(snr_db, 10.0, atol=1.0)


def test_pitch_shift_moves_frequency(rng):
    x = _tone(440)
    y = pitch_shift(x, rng, 12.0, 12.0, p=1.0)  # +1 octave
    f = np.fft.rfftfreq(L, 1 / SR)
    peak = f[np.abs(np.fft.rfft(np.asarray(y)[0] * np.hanning(L))).argmax()]
    assert 850 < peak < 910, peak


def test_time_stretch_preserves_length(rng):
    x = _tone(440)
    y = time_stretch(x, rng, 0.9, 0.9, p=1.0)  # sped up: content ends early
    assert y.shape == x.shape
    # tail beyond the resampled content is zero-padded (length fixed)
    assert np.abs(np.asarray(y)[:, -100:]).max() < 1e-6
    # slowed-down stretch also preserves length, no zero tail
    y2 = time_stretch(x, rng, 1.1, 1.1, p=1.0)
    assert y2.shape == x.shape
    assert np.abs(np.asarray(y2)[:, -100:]).max() > 1e-3


def test_splice_out_compacts(rng):
    x = jnp.asarray(np.arange(1, L + 1, dtype=np.float32)[None, :])
    y = np.asarray(splice_out(x, rng, 2, 500, p=1.0))[0]
    nz = y[y != 0]
    # kept samples preserve order and are a subsequence of the input
    assert (np.diff(nz) > 0).all()
    assert L - 1000 <= len(nz) < L
    # tail zero-padded
    assert (y[len(nz):] == 0).all()


def test_time_masking_zeroes_windows(rng):
    x = jnp.ones((2, L))
    y = np.asarray(time_masking(x, rng, num_masks=3, mask_fraction=0.01, p=1.0))
    zeros = (y == 0).sum(axis=-1)
    assert (zeros >= int(L * 0.01)).all()
    assert (zeros <= 3 * int(L * 0.01)).all()


@pytest.mark.slow
def test_splice_out_single_pass_matches_multipass(rng):
    """The select-among-shifts formulation equals the earlier N sequential
    delete passes bit-for-bit (both implement union-cut + compact)."""

    def splice_out_multipass(x, key, num_intervals, max_width, p):
        b, l = x.shape
        k1, k2, k3 = jax.random.split(key, 3)
        starts = jax.random.randint(k1, (b, num_intervals), 0, jnp.maximum(l - max_width, 1))
        widths = jax.random.randint(k2, (b, num_intervals), 1, max_width + 1)
        order = jnp.argsort(starts, axis=1)
        starts = jnp.take_along_axis(starts, order, axis=1)
        ends = starts + jnp.take_along_axis(widths, order, axis=1)
        run_max = jax.lax.associative_scan(jnp.maximum, ends, axis=1)
        prev_max = jnp.concatenate([jnp.zeros((b, 1), ends.dtype), run_max[:, :-1]], axis=1)
        cut_start = jnp.maximum(starts, prev_max)
        cut_width = jnp.maximum(ends, prev_max) - cut_start
        xz = x
        idx = jnp.arange(l)[None, :]
        for i in range(num_intervals - 1, -1, -1):
            s_i, w_i = cut_start[:, i], cut_width[:, i]
            x2 = jnp.concatenate([xz, jnp.zeros_like(xz)], axis=1)
            shifted = jax.vmap(lambda row, w: jax.lax.dynamic_slice(row, (w,), (l,)))(x2, w_i)
            xz = jnp.where(idx < s_i[:, None], xz, shifted)
        from audio_few_shot_learning_tpu.ops.waveaugment import _mix, _per_example

        return _mix(_per_example(k3, b, p), xz, x)

    nprng = np.random.default_rng(0)
    for trial, (b, l, n, w) in enumerate(
        [(6, 4000, 8, 400), (4, 1000, 3, 500), (5, 2048, 1, 100), (3, 500, 8, 120)]
    ):
        x = jnp.asarray(nprng.standard_normal((b, l)).astype(np.float32))
        for seed in range(3):
            k = jax.random.PRNGKey(seed + 100 * trial)
            np.testing.assert_array_equal(
                np.asarray(splice_out(x, k, n, w, p=1.0)),
                np.asarray(splice_out_multipass(x, k, n, w, p=1.0)),
            )


def test_fused_noise_hp_bs_matches_parts(rng):
    """noise_highpass_bandstop: filters-only mode is draw-for-draw identical
    to highpass_bandstop; noise-only mode hits the target SNR via the
    Parseval scaling; all-off passes through exactly."""
    nprng = np.random.default_rng(1)
    x = jnp.asarray(nprng.standard_normal((6, L)).astype(np.float32))
    kn, kh, kb = jax.random.split(jax.random.PRNGKey(3), 3)

    a = noise_highpass_bandstop(
        x, kn, kh, kb, 10, 25, -2, 2, 1000, 2000, 1000, 2000, 0.5, 1.0,
        0.0, 0.3, 0.5, SR,
    )
    b = highpass_bandstop(x, kh, kb, 1000, 2000, 1000, 2000, 0.5, 1.0, 0.3, 0.5, SR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    y = np.asarray(
        noise_highpass_bandstop(
            x, kn, kh, kb, 10.0, 10.0, 0.0, 0.0, 1000, 2000, 1000, 2000,
            0.5, 1.0, 1.0, 0.0, 0.0, SR,
        )
    )
    noise = y - np.asarray(x)
    snr = 20 * np.log10(
        np.sqrt((np.asarray(x) ** 2).mean(-1)) / np.sqrt((noise**2).mean(-1))
    )
    np.testing.assert_allclose(snr, 10.0, atol=0.4)

    z = noise_highpass_bandstop(
        x, kn, kh, kb, 10, 25, -2, 2, 1000, 2000, 1000, 2000, 0.5, 1.0,
        1e-9, 1e-9, 1e-9, SR,
    )
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_fused_noise_spectrum_matches_time_domain_noise():
    """Frequency-domain noise synthesis has the same spectral shape as the
    time-domain add_colored_noise it replaces (mean PSD ratio across draws)."""
    nprng = np.random.default_rng(2)
    x = jnp.asarray(nprng.standard_normal((4, L)).astype(np.float32))
    kh, kb = jax.random.split(jax.random.PRNGKey(0))
    ps_f, ps_o = [], []
    for s in range(12):
        k = jax.random.PRNGKey(s)
        yf = np.asarray(
            noise_highpass_bandstop(
                x, k, kh, kb, 10.0, 10.0, 2.0, 2.0, 1000, 2000, 1000, 2000,
                0.5, 1.0, 1.0, 0.0, 0.0, SR,
            )
        ) - np.asarray(x)
        yo = np.asarray(add_colored_noise(x, k, 10.0, 10.0, 2.0, 2.0, 1.0, SR)) - np.asarray(x)
        ps_f.append(np.abs(np.fft.rfft(yf, axis=-1)) ** 2)
        ps_o.append(np.abs(np.fft.rfft(yo, axis=-1)) ** 2)
    pf = np.mean(ps_f, axis=(0, 1))
    po = np.mean(ps_o, axis=(0, 1))
    lo, hi = slice(10, 400), slice(2000, 6000)
    r_f = pf[hi].mean() / pf[lo].mean()
    r_o = po[hi].mean() / po[lo].mean()
    assert 0.4 < r_f / r_o < 2.5, (r_f, r_o)


def test_full_chain_views():
    params = WaveAugParams.from_dict(
        {
            "use": True,
            "aug_num": 3,
            "min_gain_in_db": -6, "max_gain_in_db": 6, "gain_p": 0.5,
            "min_snr_in_db": 10, "max_snr_in_db": 25,
            "noise_min_f_decay": -2, "noise_max_f_decay": 2, "noise_p": 0.5,
            "bandstop_min_bandwidth_fraction": 0.5, "bandstop_max_bandwidth_fraction": 1,
            "bandstop_p": 0.5, "highpass_p": 0.3, "lowpass_p": 0.5,
            "pitchshift_min_transpose_semitones": -4, "pitchshift_max_transpose_semitones": 4,
            "pitchshift_p": 0.5, "shift_min_shift": -0.5, "shift_max_shift": 0.5, "shift_p": 0.5,
            "spliceout_num_time_intervals": 8, "spliceout_max_width": 400, "spliceout_p": 0.5,
            "timeinversion_p": 0, "min_stretch_ratio": 0.9, "max_stretch_ratio": 1.1,
            "timestretch_p": 0, "timemasking_masks": 5, "timemasking_mask_fraction": 0.01,
            "timemasking_p": 0.5,
        }
    )
    aug = WaveAugment(params, dataset_name="ESC-50-master")
    x = _tone(440, b=3)
    out = jax.jit(lambda a, k: aug(a, k))(x, jax.random.PRNGKey(0))
    assert out.shape == (3, 4, L)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x))  # original first
    assert np.isfinite(np.asarray(out)).all()
    # augmented copies differ from the original
    assert not np.allclose(np.asarray(out[:, 1]), np.asarray(x))


def test_batched_copies_are_independent():
    """The aug_num copies fold into one chain pass (__call__); draws must
    still be independent per copy, with the original first."""
    params = WaveAugParams({"use": True, "aug_num": 3})
    aug = WaveAugment(params, dataset_name="ESC-50-master")
    x = _tone(440, b=2)
    out = np.asarray(jax.jit(lambda a, k: aug(a, k))(x, jax.random.PRNGKey(7)))
    assert out.shape == (2, 4, L)
    np.testing.assert_allclose(out[:, 0], np.asarray(x))  # original untouched
    diffs = [
        np.abs(out[:, i] - out[:, j]).max()
        for i in range(1, 4) for j in range(i + 1, 4)
    ]
    assert all(d > 1e-4 for d in diffs), diffs  # copies differ pairwise


def test_fuse_lowpass_matches_sequential_filters_only(rng):
    """Opt-in fuse_lowpass: with ONLY lowpass + highpass enabled, folding the
    lowpass into the shared-spectrum group must reproduce the sequential
    chain (lowpass then highpass) up to one extra f32 FFT roundtrip — the
    masks commute and both paths see identical random draws."""
    base = {
        "use": True, "aug_num": 1,
        "lowpass_p": 0.7, "highpass_p": 0.6,
        "noise_p": 0.0, "bandstop_p": 0.0, "gain_p": 0.0,
        "pitchshift_p": 0.0, "shift_p": 0.0, "timeinversion_p": 0.0,
        "spliceout_p": 0.0, "timestretch_p": 0.0, "timemasking_p": 0.0,
    }
    nprng = np.random.default_rng(4)
    x = jnp.asarray(nprng.standard_normal((8, L)).astype(np.float32))
    key = jax.random.PRNGKey(9)
    seq = WaveAugment(WaveAugParams.from_dict(base), dataset_name="ESC-50-master")
    fus = WaveAugment(
        WaveAugParams.from_dict({**base, "fuse_lowpass": True}),
        dataset_name="ESC-50-master",
    )
    a = np.asarray(seq.apply_once(x, key))
    b = np.asarray(fus.apply_once(x, key))
    assert not np.allclose(a, np.asarray(x))  # something actually applied
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_fuse_lowpass_full_chain_runs():
    """fuse_lowpass with the full flagship-style chain: right shapes, finite,
    original view untouched, augmented copies actually modified. (Fused-
    lowpass numerical equivalence is pinned by the filters-only test above —
    here the added colored noise makes spectral assertions meaningless.)"""
    cfg = {
        "use": True, "aug_num": 2, "fuse_lowpass": True,
        "min_gain_in_db": -6, "max_gain_in_db": 6, "gain_p": 0.5,
        "min_snr_in_db": 10, "max_snr_in_db": 25,
        "noise_min_f_decay": -2, "noise_max_f_decay": 2, "noise_p": 0.5,
        "bandstop_min_bandwidth_fraction": 0.5, "bandstop_max_bandwidth_fraction": 1,
        "bandstop_p": 0.5, "highpass_p": 0.3, "lowpass_p": 1.0,
        "pitchshift_p": 0.5, "shift_p": 0.5, "spliceout_p": 0.5,
        "spliceout_num_time_intervals": 8, "spliceout_max_width": 400,
        "timeinversion_p": 0, "timestretch_p": 0, "timemasking_p": 0.5,
        "timemasking_masks": 5, "timemasking_mask_fraction": 0.01,
    }
    aug = WaveAugment(WaveAugParams.from_dict(cfg), dataset_name="ESC-50-master")
    x = _tone(440, b=3)
    out = jax.jit(lambda a, k: aug(a, k))(x, jax.random.PRNGKey(1))
    assert out.shape == (3, 3, L)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x))
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out[:, 1]), np.asarray(x))


def test_pitch_shift_pv_duration_preserving(rng):
    """Phase-vocoder A/B arm (pitchshift_mode='pv'): +1 octave moves a 440 Hz
    tone to ~880 Hz AND keeps the full duration energized — unlike the
    default resample arm, whose sped-up read leaves a zero-padded tail."""
    from audio_few_shot_learning_tpu.ops.waveaugment import pitch_shift_pv

    x = _tone(440)
    y = np.asarray(pitch_shift_pv(x, rng, 12.0, 12.0, p=1.0))
    assert y.shape == x.shape
    f = np.fft.rfftfreq(L, 1 / SR)
    peak = f[np.abs(np.fft.rfft(y[0] * np.hanning(L))).argmax()]
    assert 850 < peak < 910, peak
    # duration preserved: the tail still carries the tone (resample arm: ~0)
    tail_rms = np.sqrt((y[:, int(0.8 * L): int(0.98 * L)] ** 2).mean())
    head_rms = np.sqrt((y[:, int(0.1 * L): int(0.3 * L)] ** 2).mean())
    assert tail_rms > 0.3 * head_rms, (tail_rms, head_rms)
    y_rs = np.asarray(pitch_shift(x, rng, 12.0, 12.0, p=1.0))
    rs_tail = np.sqrt((y_rs[:, int(0.8 * L): int(0.98 * L)] ** 2).mean())
    assert rs_tail < 1e-5  # the deviation the PV arm removes


def test_pitch_shift_pv_downshift(rng):
    """-12 semitones: 880 -> ~440 Hz, full length, no blow-up."""
    from audio_few_shot_learning_tpu.ops.waveaugment import pitch_shift_pv

    x = _tone(880)
    y = np.asarray(pitch_shift_pv(x, rng, -12.0, -12.0, p=1.0))
    f = np.fft.rfftfreq(L, 1 / SR)
    peak = f[np.abs(np.fft.rfft(y[0] * np.hanning(L))).argmax()]
    assert 410 < peak < 470, peak
    assert np.isfinite(y).all()
    assert np.abs(y).max() < 3.0


def test_pitch_shift_pv_in_chain(rng):
    """pitchshift_mode='pv' is honored by the WaveAugment chain."""
    params = WaveAugParams.from_dict(
        {"use": True, "aug_num": 1, "pitchshift_mode": "pv", "pitchshift_p": 1.0,
         "pitchshift_min_transpose_semitones": 2, "pitchshift_max_transpose_semitones": 2,
         "lowpass_p": 0, "gain_p": 0, "noise_p": 0, "highpass_p": 0, "bandstop_p": 0,
         "shift_p": 0, "timeinversion_p": 0, "spliceout_p": 0, "timestretch_p": 0,
         "timemasking_p": 0}
    )
    aug = WaveAugment(params, dataset_name="ESC-50-master")
    x = _tone(440, b=2)
    out = np.asarray(aug(x, jax.random.PRNGKey(0)))
    assert out.shape == (2, 2, L)
    assert not np.allclose(out[:, 1], np.asarray(x))


def test_pitch_shift_pv_under_jit_and_remat(rng):
    """pv must compile inside the jitted+remat train step: the overlap-add
    weight is built with np.add.at at trace time, and an np.asarray on the
    window jnp constant was a TracerArrayConversionError under remat (caught
    by the first full ab_deviations pv training run, 2026-08-18)."""
    from audio_few_shot_learning_tpu.ops.waveaugment import pitch_shift_pv

    x = _tone(440, b=2)
    y0 = np.asarray(pitch_shift_pv(x, rng, -3.0, 3.0, p=1.0))
    f = jax.jit(jax.checkpoint(lambda xx, kk: pitch_shift_pv(xx, kk, -3.0, 3.0, p=1.0)))
    y1 = np.asarray(f(x, rng))
    # compiled-vs-eager float32 FFT reassociation only
    np.testing.assert_allclose(y0, y1, atol=2e-3)
