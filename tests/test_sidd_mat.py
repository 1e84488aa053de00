"""L1 raw-I/O tests against GENUINE .MAT files (VERDICT r3 item 6).

The round-3 suite exercised load_image_tuple only on numpy stand-ins; here
the fixture writer (data/mat_fixtures.py) emits real MATLAB v7.3 (HDF5) and
legacy v5 files in the exact SIDD_Medium_Raw directory layout, plus the v5
metadata struct with the NLF at UnknownTags[7,0][2][0][0:2]
(ref:sidd/sidd_utils.py:224-283,718-729), and the production enumeration +
decode + cache + native-loader path runs over them end to end.
"""

import os

import numpy as np
import pytest

from noise_flow_tpu.data.mat_fixtures import (
    save_metadata_mat,
    write_sidd_dataset,
    write_sidd_scene,
)
from noise_flow_tpu.data.sidd import (
    TRAIN_INSTANCE_IDS,
    load_image_tuple,
    load_metadata_nlf,
    pack_raw,
    sidd_filename_tuples,
    unpack_raw,
)

B1, B2 = 0.00123, 4.5e-6


@pytest.fixture(scope="module", params=["v7.3", "v5"])
def sidd_root(request, tmp_path_factory):
    root = tmp_path_factory.mktemp("SIDD_Medium_Raw_" +
                                   request.param.replace(".", "")) / "Data"
    write_sidd_scene(str(root), TRAIN_INSTANCE_IDS[0], cam="GP", iso=800,
                     h=64, w=96, beta1=B1, beta2=B2, seed=3,
                     mat_version=request.param)
    return str(root)


def test_enumeration_finds_scene(sidd_root):
    tuples, n_inst = sidd_filename_tuples(sidd_root, "train", 0, 1)
    assert n_inst == 1 and len(tuples) == 1
    for p in tuples[0]:
        assert os.path.exists(p), p


def test_load_image_tuple_real_mat(sidd_root):
    tuples, _ = sidd_filename_tuples(sidd_root, "train", 0, 1)
    d = load_image_tuple(tuples[0])
    # packed RGGB half-res, leading batch dim
    assert d["noise"].shape == (1, 32, 48, 4)
    assert d["clean"].shape == (1, 32, 48, 4)
    assert d["iso"] == 800.0
    assert d["cam"] == 1.0  # GP
    assert d["nlf0"] == pytest.approx(B1, rel=1e-6)
    assert d["nlf1"] == pytest.approx(B2, rel=1e-6)
    # noise really is noisy - clean, and scales like the written NLF
    assert np.all(np.isfinite(d["noise"]))
    sd = float(d["noise"].std())
    pred = float(np.sqrt(B1 * d["clean"].mean() + B2))
    assert 0.7 * pred < sd < 1.3 * pred, (sd, pred)


def test_pack_unpack_roundtrip_on_written_bayer(sidd_root):
    tuples, _ = sidd_filename_tuples(sidd_root, "train", 0, 1)
    from noise_flow_tpu.data.sidd import _read_mat_array
    bayer = np.asarray(_read_mat_array(tuples[0][1]), np.float32)
    assert bayer.shape == (64, 96)
    packed = pack_raw(bayer)
    np.testing.assert_array_equal(unpack_raw(packed), bayer)


def test_metadata_nlf_floor(tmp_path):
    """Non-positive NLF entries are floored at 1e-6
    (ref:sidd_utils.py:269-271)."""
    p = str(tmp_path / "meta.MAT")
    save_metadata_mat(p, -0.5, 0.0, iso=100)
    nlf0, nlf1 = load_metadata_nlf(p)
    assert nlf0 == 1e-6 and nlf1 == 1e-6


def test_full_pipeline_over_real_mat(tmp_path):
    """Enumeration -> decode -> npy cache -> C++ native loader, end to end
    over genuine v7.3 files (the production input path's full ladder)."""
    root = str(tmp_path / "SIDD_Medium_Raw" / "Data")
    write_sidd_dataset(root, TRAIN_INSTANCE_IDS[:2], cam="S6", iso=100,
                       h=64, w=64, nlf=(B1, B2))
    tuples, n_inst = sidd_filename_tuples(root, "train", 0, 1)
    assert n_inst == 2
    samples = [load_image_tuple(t) for t in tuples]

    from noise_flow_tpu.data.cache import (
        load_cached_samples, write_cache_from_samples)
    cache = str(tmp_path / "cache")
    write_cache_from_samples(samples, cache)
    back = load_cached_samples(cache)
    assert len(back) == 2
    np.testing.assert_allclose(back[0]["noise"], samples[0]["noise"],
                               atol=1e-7)
    assert back[0]["iso"] == 100.0

    try:
        from noise_flow_tpu.data.native import NativePatchLoader
        loader = NativePatchLoader(cache, 16, 8, 4, shuffle=False, seed=0)
    except (OSError, RuntimeError) as e:
        pytest.skip(f"native loader unavailable: {e}")
    mbs = list(loader.epoch())
    assert mbs and mbs[0]["_x"].shape == (8, 16, 16, 4)
    assert np.all(np.isfinite(mbs[0]["_x"]))


def test_download_gate_reports_instructions(tmp_path):
    """--download_sidd path: absent data + no download permission must raise
    with actionable instructions (this environment has zero egress; a real
    fetch attempt is documented in experiments/ref_parity/README.md)."""
    from noise_flow_tpu.data.bootstrap import check_download_sidd
    with pytest.raises(FileNotFoundError, match="SIDD_Medium_Raw"):
        check_download_sidd(str(tmp_path / "nope"), allow_download=False)
