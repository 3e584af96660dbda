"""Tests for the native (C++) sequence generator and its numpy fallback."""
import numpy as np
import pytest

from sqair_tpu.data import native
from sqair_tpu.data.synthetic import make_template_bank

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native datagen library not built"
)


@pytest.fixture(scope="module")
def bank():
    return make_template_bank(16, 12, seed=0)


@pytest.fixture(scope="module")
def data(bank):
    return native.generate_sequences_native(
        bank, n_samples=200, n_timesteps=6, canvas_size=(30, 30),
        n_objects=(0, 2), seed=7,
    )


class TestContract:
    def test_shapes_and_dtypes(self, data):
        assert data["imgs"].shape == (6, 200, 30, 30)
        assert data["imgs"].dtype == np.uint8
        assert data["nums"].shape == (1, 200, 3)
        assert data["coords"].shape == (6, 200, 2, 4)
        assert data["coords"].dtype == np.float32

    def test_nums_cumulative_one_hot(self, data):
        nums = data["nums"][0]
        # cumulative one-hot: each row is 1...1 0...0
        for row in nums:
            n = int(row.astype(np.int64).sum())
            assert (row[:n] == 1).all() and (row[n:] == 0).all()

    def test_counts_cover_range(self, data):
        counts = data["nums"][0].astype(np.int64).sum(-1)
        assert set(np.unique(counts)) <= {0, 1, 2}
        assert len(np.unique(counts)) == 3  # all object counts occur

    def test_empty_sequences_blank(self, data):
        counts = data["nums"][0].astype(np.int64).sum(-1)
        empties = np.where(counts == 0)[0]
        assert (data["imgs"][:, empties] == 0).all()

    def test_coords_in_canvas(self, data):
        counts = data["nums"][0].astype(np.int64).sum(-1)
        for i in range(200):
            for j in range(counts[i]):
                c = data["coords"][:, i, j]  # [T, 4]
                assert (c[:, 0] >= 0).all() and (c[:, 0] + c[:, 2] <= 30).all()
                assert (c[:, 1] >= 0).all() and (c[:, 1] + c[:, 3] <= 30).all()

    def test_unused_slots_zero(self, data):
        counts = data["nums"][0].astype(np.int64).sum(-1)
        for i in range(200):
            assert (data["coords"][:, i, counts[i]:] == 0).all()


class TestDynamics:
    def test_deterministic(self, bank, data):
        again = native.generate_sequences_native(
            bank, n_samples=200, n_timesteps=6, canvas_size=(30, 30),
            n_objects=(0, 2), seed=7,
        )
        np.testing.assert_array_equal(data["imgs"], again["imgs"])
        np.testing.assert_array_equal(data["coords"], again["coords"])

    def test_seed_changes_output(self, bank, data):
        other = native.generate_sequences_native(
            bank, n_samples=200, n_timesteps=6, canvas_size=(30, 30),
            n_objects=(0, 2), seed=8,
        )
        assert not np.array_equal(data["imgs"], other["imgs"])

    def test_objects_move(self, data):
        counts = data["nums"][0].astype(np.int64).sum(-1)
        movers = np.where(counts > 0)[0]
        pos0 = data["coords"][0, movers, :, :2]
        pos_last = data["coords"][-1, movers, :, :2]
        # most objects should have moved over 6 steps
        assert (np.abs(pos0 - pos_last).sum(-1) > 0.5).mean() > 0.5

    def test_static_placement_no_overlap(self, bank):
        """At t=0 the integer-rounded bboxes must not overlap."""
        d = native.generate_sequences_native(
            bank, n_samples=100, n_timesteps=1, canvas_size=(40, 40),
            n_objects=(2, 2), seed=3,
        )
        for i in range(100):
            boxes = np.round(d["coords"][0, i]).astype(int)  # [2, 4]
            (y0, x0, h0, w0), (y1, x1, h1, w1) = boxes
            overlap_y = max(0, min(y0 + h0, y1 + h1) - max(y0, y1))
            overlap_x = max(0, min(x0 + w0, x1 + w1) - max(x0, x1))
            assert overlap_y * overlap_x == 0, f"sample {i} overlaps"


class TestFallbackContract:
    def test_generate_sequences_dispatch(self, bank):
        d = native.generate_sequences(bank, n_samples=10, n_timesteps=3,
                                      canvas_size=(30, 30))
        assert d["imgs"].shape == (3, 10, 30, 30)
        assert d["nums"].shape[1] == 10
