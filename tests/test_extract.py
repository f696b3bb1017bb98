"""Tile-extraction pipeline tests on synthetic slides."""

import numpy as np

from modaltune_tpu.data.extract import (array_slide_reader,
                                        extract_slide_features,
                                        plan_patches, rgb_to_lab_l,
                                        tissue_mask)


def make_synthetic_slide(h=1024, w=1024, tile=256):
    """White background with a dark tissue blob in the top-left 512x512."""
    slide = np.full((h, w, 3), 255, np.uint8)
    slide[:512, :512] = [150, 80, 120]  # tissue-ish color
    return slide


def test_lab_l_white_vs_dark():
    white = np.full((2, 2, 3), 255, np.uint8)
    dark = np.full((2, 2, 3), 60, np.uint8)
    assert rgb_to_lab_l(white).mean() > 95
    assert rgb_to_lab_l(dark).mean() < 40


def test_plan_selects_tissue_tiles():
    slide = make_synthetic_slide()
    ds = 8
    thumb = slide[::ds, ::ds]
    mask = tissue_mask(thumb)
    plan = plan_patches(mask, mask_downsample=ds, tile_size=256)
    # exactly the 2x2 tiles covering the 512x512 tissue region
    assert len(plan.coords) == 4
    assert set(map(tuple, plan.coords.tolist())) == {
        (0, 0), (0, 256), (256, 0), (256, 256)}


def test_extract_features_end_to_end(tmp_path):
    slide = make_synthetic_slide()
    ds = 8
    mask = tissue_mask(slide[::ds, ::ds])

    def mean_encoder(tiles):
        return tiles.reshape(len(tiles), -1, 3).mean(axis=1)

    out = extract_slide_features(array_slide_reader(slide), mask, ds,
                                 mean_encoder, tile_size=256,
                                 batch_size=3,
                                 output_npz=str(tmp_path / "s1.npz"))
    assert out["features"].shape == (4, 3)
    assert out["coords"].shape == (4, 2)
    # tissue tiles should have the tissue mean color
    np.testing.assert_allclose(out["features"][0], [150, 80, 120],
                               atol=1.0)
    # cache readable by the runtime loader
    from modaltune_tpu.data import load_feature_bag
    f, c = load_feature_bag(str(tmp_path / "s1.npz"))
    assert f.shape == (4, 3) and c.shape == (4, 2)


def test_titan_extraction_driver():
    """TITAN-specific driver (TCGA_extract_feats_TITAN.py): 512-px
    tiles, pluggable CONCH patch encoder, optional slide embedding."""
    from modaltune_tpu.data.extract import (array_slide_reader,
                                            extract_slide_features_titan,
                                            tissue_mask)
    rng = np.random.RandomState(0)
    slide = np.full((2048, 2048, 3), 255, np.uint8)
    slide[:1024, :1024] = rng.randint(30, 120, (1024, 1024, 3))
    thumb = slide[::16, ::16]
    mask = tissue_mask(thumb)

    def patch_encoder(tiles):
        return tiles.reshape(tiles.shape[0], -1)[:, :8].astype(
            np.float32) / 255.0

    def slide_encoder(feats, coords):
        return feats.mean(0)

    bag = extract_slide_features_titan(
        array_slide_reader(slide), mask, 16,
        patch_encoder, slide_encoder=slide_encoder)
    assert bag["features"].shape[1] == 8
    assert bag["coords"].shape == (bag["features"].shape[0], 2)
    assert bag["slide_embedding"].shape == (8,)
    # 512-px grid: coords are multiples of 512 inside the tissue square
    assert np.all(bag["coords"] % 512 == 0)
    assert bag["coords"].max() < 1024


def test_load_embedding_dict_npz_and_pt(tmp_path):
    """The same case->array table loads from .npz and from the
    reference's torch .pt distribution format (data_utils/datasets.py:180
    torch.loads text_location); values must come back float32-identical."""
    import torch

    from modaltune_tpu.data import load_embedding_dict

    rng = np.random.RandomState(3)
    table = {f"TCGA-{i:02d}": rng.randn(4, 512).astype(np.float32)
             for i in range(3)}
    np.savez(tmp_path / "emb.npz", **table)
    torch.save({k: torch.from_numpy(v) for k, v in table.items()},
               tmp_path / "emb.pt")

    a = load_embedding_dict(str(tmp_path / "emb.npz"))
    b = load_embedding_dict(str(tmp_path / "emb.pt"))
    assert set(a) == set(b) == set(table)
    for k in table:
        np.testing.assert_array_equal(a[k], table[k])
        np.testing.assert_array_equal(b[k], table[k])
        assert b[k].dtype == np.float32
