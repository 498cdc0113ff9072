"""Reference-class semantic profile: Mapillary 19-class ingestion +
the trained artifact evaluated on the DISJOINT generator family
(VERDICT r3 item 6). Reference: `scripts/trt_interface.py:16-80`,
`data/colors_mapillary*.csv`."""
import os

import numpy as np
import pytest

from dddmr_navigation_tpu.perception import semantic_scene19 as s19
from dddmr_navigation_tpu.perception.semantic import (
    load_class_map_csv, colorize_classes, segmentation_to_pointcloud)

CSV_DIR = "/root/reference/src/dddmr_semantic_segmentation/data"
ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "semantic_ddrnet19.npz")


@pytest.mark.skipif(not os.path.isdir(CSV_DIR),
                    reason="reference CSVs not mounted")
def test_mapillary_csv_ingestion():
    names, colors = load_class_map_csv(
        os.path.join(CSV_DIR, "colors_mapillary.csv"))
    assert len(names) == 19 and colors.shape == (19, 3)
    assert names == s19.CLASS_NAMES
    assert names[s19.PERSON] == "PERSON"
    assert list(colors[s19.SKY]) == [70, 130, 180]
    # the display-remap variant (person_and_sidewalk) shares the id order
    names2, colors2 = load_class_map_csv(
        os.path.join(CSV_DIR, "colors_mapillary_person_and_sidewalk.csv"))
    assert names2 == names
    assert list(colors2[s19.PERSON]) == [0, 0, 255]
    # colorize with the remap: person pixels get the remap color
    mask = np.full((4, 4), s19.PERSON, np.int32)
    img = np.asarray(colorize_classes(mask, colors2))
    assert (img == [0, 0, 255]).all()


def test_presets_are_disjoint_families():
    """The eval generator family shares NO camera geometry with training
    (the generator-independence guarantee in the artifact metadata)."""
    t, e = s19.TRAIN_PRESET, s19.EVAL_PRESET
    assert t.pitch_deg[0] > e.pitch_deg[1] or e.pitch_deg[0] > t.pitch_deg[1]
    assert t.cam_height[1] < e.cam_height[0] or e.cam_height[1] < t.cam_height[0]
    assert t.layout != e.layout


def test_scene19_covers_all_classes():
    rng = np.random.default_rng(3)
    seen = set()
    for _ in range(25):
        _, _, lab = s19.render_scene19(rng, 120, 160, s19.TRAIN_PRESET)
        seen |= set(np.unique(lab).tolist())
    assert seen == set(range(19)), sorted(set(range(19)) - seen)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(ART),
                    reason="19-class artifact not trained yet")
def test_artifact_generalizes_to_disjoint_generator():
    import json
    import jax
    import jax.numpy as jnp
    from dddmr_navigation_tpu.perception.semantic import (
        init_segmenter, infer_classes, load_params)
    from dddmr_navigation_tpu.perception.semantic_data import miou

    meta = json.load(open(ART + ".json"))
    assert meta["num_classes"] == 19
    assert "DISJOINT" in meta["eval_note"]
    h, w = meta["image_hw"]
    model, template = init_segmenter(
        jax.random.PRNGKey(0), height=h, width=w, num_classes=19,
        net_width=meta["net_width"])
    params = load_params(ART, template)

    rng = np.random.default_rng(555)     # fresh seed, EVAL family
    rgb, labels = s19.make_batch19(rng, 4, h, w, preset=s19.EVAL_PRESET)
    pred = np.asarray(infer_classes(model, params, jnp.asarray(rgb)))
    score = miou(pred, labels, num_classes=19)
    # generator-independent floor: the committed artifact must transfer
    # to the family it never trained on
    assert score >= 0.30, score
    assert score >= 0.8 * meta["miou_heldout"] - 0.1

    # class-labeled point cloud with ids straight from the ingested CSV
    # (PERSON + VEGETATION, the person_and_sidewalk deployment's classes)
    rgb1, depth1, lab1 = s19.render_scene19(rng, h, w, s19.EVAL_PRESET)
    pred1 = np.asarray(infer_classes(model, params,
                                     jnp.asarray(rgb1[None])))[0]
    cloud, valid = segmentation_to_pointcloud(
        jnp.asarray(depth1), jnp.asarray(pred1), fx=0.63 * w, fy=0.63 * w,
        cx=w / 2, cy=h / 2, keep_classes=[s19.PERSON, s19.VEGETATION])
    cloud = np.asarray(cloud)[np.asarray(valid)]
    if len(cloud):
        assert set(np.unique(cloud[:, 3].astype(int))) <= {
            s19.PERSON, s19.VEGETATION}
