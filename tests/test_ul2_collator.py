"""UL2 collator behavior tests (semantics pinned by reference
src/data/data_collator_ul2.py; the 7-denoiser mixture comes from
train_flash_t5.py:57-64)."""

import numpy as np
import pytest

from flasht5_tpu.data.ul2_collator import (
    DataCollatorForUL2,
    Denoiser,
    compute_input_and_target_lengths,
    random_spans_noise_mask,
)


class FakeTokenizer:
    """100 sentinels at ids 900..999 (descending extra ids), eos=1, pad=0."""
    eos_token_id = 1
    pad_token_id = 0

    def encode(self, text):
        mapping = {"[R]": [10, 1], "[S]": [11, 1], "[X]": [12, 1]}
        return mapping.get(text, [13, 1])

    @property
    def all_special_tokens(self):
        return [f"<extra_id_{i}>" for i in range(100)] + ["</s>", "<pad>"]

    @property
    def all_special_ids(self):
        return [999 - i for i in range(100)] + [1, 0]


UL2_DENOISERS = [
    Denoiser(mu=3.0, r=0.15, max_spans=100, prefix="[R]"),
    Denoiser(mu=8.0, r=0.15, max_spans=100, prefix="[R]"),
    Denoiser(mu=4.0, r=0.0, max_spans=1, prefix="[S]"),
    Denoiser(mu=3.0, r=0.5, max_spans=100, prefix="[X]"),
    Denoiser(mu=8.0, r=0.5, max_spans=100, prefix="[X]"),
    Denoiser(mu=64.0, r=0.15, max_spans=100, prefix="[X]"),
    Denoiser(mu=64.0, r=0.5, max_spans=100, prefix="[X]"),
]


def make_collator(**kw):
    args = dict(tokenizer=FakeTokenizer(), max_length=64, max_labels_length=64,
                batch_size=4, denoiser_list=UL2_DENOISERS,
                denoiser_proportions=[1] * 7, seed=0)
    args.update(kw)
    return DataCollatorForUL2(**args)


def _examples(n=8, lo=20, hi=120, seed=0):
    rng = np.random.default_rng(seed)
    return [{"input_ids": rng.integers(20, 800, size=(1, int(rng.integers(lo, hi)))).astype(np.int32)}
            for _ in range(n)]


def test_noise_mask_properties():
    rng = np.random.default_rng(0)
    for d in UL2_DENOISERS:
        if d.r == 0.0:
            continue
        mask = random_spans_noise_mask(100, d, rng)
        assert mask.shape == (100,)
        assert 0 < mask.sum() < 100
        if d.max_spans < 100:
            n_spans = int((np.diff(mask.astype(int)) == 1).sum() + mask[0])
            assert n_spans <= d.max_spans


def test_s_denoiser_single_suffix_span():
    rng = np.random.default_rng(0)
    d = Denoiser(mu=4.0, r=0.0, max_spans=1, prefix="[S]")
    mask = random_spans_noise_mask(40, d, rng)
    # single noise span at the END of the sequence
    changes = np.diff(mask.astype(int))
    assert (changes == -1).sum() == 0
    assert (changes == 1).sum() == 1
    assert mask[-1]


def test_length_solver():
    # corrupted encoding must fit within the requested budget
    for r, mu in [(0.15, 3.0), (0.5, 8.0), (0.15, 64.0)]:
        raw, tgt = compute_input_and_target_lengths(512, r, mu)
        num_noise = int(round(raw * r))
        num_spans = int(round(num_noise / mu))
        assert raw - num_noise + num_spans + 1 <= 512
        assert tgt == num_noise + num_spans + 1


def test_collate_shapes_and_masks():
    coll = make_collator()
    batch = coll(_examples(12))
    b, L = batch["input_ids"].shape
    assert L == 64
    assert batch["labels"].shape[1] == 64
    assert b <= 4
    np.testing.assert_array_equal(batch["attention_mask"],
                                  batch["input_ids"] != 0)
    assert (batch["labels"][batch["labels"] != -100] >= 0).all()


def test_sentinels_contiguous_descending():
    coll = make_collator()
    batch = coll(_examples(12, seed=3))
    for row in batch["input_ids"]:
        sent = row[(row <= 999) & (row >= 900)]
        if len(sent):
            assert sent[0] == 999
            assert (np.diff(sent) == -1).all()


def test_input_label_sentinel_correspondence():
    coll = make_collator(batch_size=2)
    batch = coll(_examples(2, lo=40, hi=60, seed=5))
    for i in range(batch["input_ids"].shape[0]):
        row_in = batch["input_ids"][i]
        row_lb = batch["labels"][i]
        s_in = set(row_in[(row_in >= 900) & (row_in <= 999)].tolist())
        valid = row_lb[row_lb != -100]
        s_lb = set(valid[(valid >= 900) & (valid <= 999)].tolist())
        # every label sentinel must appear in the inputs
        assert s_lb <= s_in


def test_fixed_batch_size_wraps():
    coll = make_collator(fixed_batch_size=True, batch_size=6)
    batch = coll(_examples(3, lo=30, hi=50))
    assert batch["input_ids"].shape[0] == 6


def test_causal_mode_concatenates():
    coll = make_collator(causal=True)
    batch = coll(_examples(8))
    assert batch["input_ids"].shape[1] == 64 + 64
    np.testing.assert_array_equal(batch["input_ids"].shape,
                                  batch["labels"].shape)


def test_eos_terminates_labels():
    coll = make_collator()
    batch = coll(_examples(8, seed=7))
    for row in batch["labels"]:
        valid = row[row != -100]
        assert valid[-1] == 1  # eos


def test_native_core_matches_constraints():
    """Native C++ packing respects the same bin constraints as the numpy
    fallback and produces a legal assignment."""
    import numpy as np
    from flasht5_tpu.native import load_ul2_core, native_best_fit, native_noise_mask

    if load_ul2_core() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    li = rng.integers(5, 60, 64)
    ll = rng.integers(3, 30, 64)
    ns = rng.integers(0, 10, 64)
    out = native_best_fit(li, ll, ns, 128, 64, 100, 8)
    for b in range(8):
        idx = out == b
        assert li[idx].sum() < 128
        assert ll[idx].sum() < 64
        assert ns[idx].sum() < 100
    # single-suffix span (S-denoiser)
    m = native_noise_mask(40, 4.0, 0.0, 1, 1)
    changes = np.diff(m.astype(int))
    assert (changes == 1).sum() == 1 and (changes == -1).sum() == 0
