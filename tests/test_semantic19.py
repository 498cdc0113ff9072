"""Reference-class semantic profile: Mapillary 19-class ingestion +
the trained artifact evaluated on the DISJOINT generator family
(VERDICT r3 item 6). Reference: `scripts/trt_interface.py:16-80`,
`data/colors_mapillary*.csv`."""
import json
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


@pytest.mark.slow
def test_semantic19_e2e_reroute():
    """The DEPLOYED-class path is the tested path (round-4 review): the
    19-class artifact's detections — not the easier 4-class one — drive
    mask → class point cloud → no-entry field → planner reroute
    (`trt_interface.py` → `semantic_segmentation2point_cloud.cpp` →
    `no_entry_layer.cpp`). Scene selection uses TRUE labels (find an
    eval-family scene with a TERRAIN patch crossing the corridor);
    detection and rerouting use the NET's output only."""
    import jax
    import jax.numpy as jnp
    from dddmr_navigation_tpu.perception.semantic import (
        init_segmenter, infer_classes, load_params,
        segmentation_to_pointcloud)
    from dddmr_navigation_tpu.perception.layers import no_entry_dgraph
    from dddmr_navigation_tpu.planning.global_.graph import build_ground_graph
    from dddmr_navigation_tpu.planning.global_.planner import plan_on_graph
    from dddmr_navigation_tpu.config import GlobalPlannerConfig
    from dddmr_navigation_tpu.io.maps import flat_ground_map

    assert os.path.exists(ART), "run tools/train_semantic.py first"
    meta = json.load(open(ART + ".json"))
    model, tmpl = init_segmenter(jax.random.PRNGKey(0), 240, 320,
                                 meta["num_classes"], meta["net_width"])
    params = load_params(ART, tmpl)

    # find an eval-family scene whose TERRAIN patch crosses the corridor
    chosen = None
    for seed in range(40):
        rng = np.random.default_rng(91_000 + seed)
        rgb, depth, lab, (pitch, cam_h) = s19.render_scene19(
            rng, 240, 320, s19.EVAL_PRESET, return_pose=True)
        ys, xs_pix = np.nonzero(lab == s19.TERRAIN)
        if len(ys) < 400:
            continue
        # world footprint of the TRUE terrain pixels (floor plane)
        fx = fy = 0.63 * 320
        zc = depth[ys, xs_pix]
        xc = (xs_pix - 160.0) / fx * zc
        yc = (ys - 120.0) / fy * zc
        cp, sp = np.cos(pitch), np.sin(pitch)
        wx = zc * cp + yc * sp
        wy = -xc
        # the eval family parks terrain off the centerline — route the
        # test corridor THROUGH the patch (start/goal at its y-center)
        y0 = float(np.median(wy))
        in_corridor = ((wx > 3.0) & (wx < 9.0)
                       & (np.abs(wy - y0) < 1.2))
        if in_corridor.sum() > 300 and abs(y0) < 4.0:
            chosen = (rgb, depth, lab, pitch, cam_h, y0)
            break
    assert chosen is not None, "no eval scene with a corridor terrain patch"
    rgb, depth, lab, pitch, cam_h, y0 = chosen

    pred = np.asarray(infer_classes(model, params, jnp.asarray(rgb[None])))[0]
    # detection quality on the deployed class: precision of predicted
    # TERRAIN pixels vs truth
    p_mask = pred == s19.TERRAIN
    assert p_mask.sum() > 300, "net detected no terrain"
    precision = (p_mask & (lab == s19.TERRAIN)).sum() / p_mask.sum()
    assert precision > 0.6, f"terrain precision {precision:.2f}"

    # class cloud from the NET's mask (reference chain), mapped to world
    fx = fy = 0.63 * 320
    cloud, valid = segmentation_to_pointcloud(
        jnp.asarray(depth), jnp.asarray(pred), fx, fy, 160.0, 120.0,
        keep_classes=[int(s19.TERRAIN)])
    pts = np.asarray(cloud)[np.asarray(valid)][:, :3]
    cp, sp = np.cos(pitch), np.sin(pitch)
    wx = pts[:, 2] * cp + pts[:, 1] * sp
    wy = -pts[:, 0]
    wz = cam_h - pts[:, 1] * cp + pts[:, 2] * sp
    world = np.stack([wx, wy, wz], 1).astype(np.float32)
    zone_pts = world[(np.abs(world[:, 2]) < 0.3) & (world[:, 0] > 1.0)
                     & (world[:, 0] < 15.0) & (np.abs(world[:, 1]) < 6.0)]
    assert len(zone_pts) > 200

    ground = flat_ground_map(16, 12, 0.25)
    ground[:, 0] += 7.0                   # x in [-1, 15]
    g = len(ground)
    field = no_entry_dgraph(
        jnp.asarray(ground), jnp.ones((g,), bool),
        jnp.asarray(zone_pts[:4096]),
        jnp.ones((min(len(zone_pts), 4096),), bool),
        inflation_distance=0.8, max_obstacle_distance=9999.0)
    graph = build_ground_graph(ground, radius=0.5, k_max=16)
    gcfg = GlobalPlannerConfig()

    def plan(dgraph):
        res = jax.jit(lambda d: plan_on_graph(
            gcfg, jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
            jnp.asarray(graph.nbr_valid), jnp.asarray(ground),
            jnp.ones((g,), bool), d, jnp.zeros((g,)),
            jnp.asarray(graph.avg_intensity),
            jnp.asarray([0.5, y0, 0.0], jnp.float32),
            jnp.asarray([12.0, y0, 0.0], jnp.float32),
            inscribed_radius=0.5, inflation_descending_rate=2.0))(dgraph)
        ids = np.asarray(res.node_ids)[np.asarray(res.node_valid)]
        return bool(res.ok), ground[ids]

    ok_free, path_free = plan(jnp.full((g,), 9999.0))
    ok_zone, path_zone = plan(field)
    assert ok_free and ok_zone
    # the detected terrain zone must bend the plan measurably where the
    # baseline ran straight through it
    dev_free = np.abs(path_free[:, 1] - y0).max()
    dev_zone = np.abs(path_zone[:, 1] - y0).max()
    assert dev_zone > dev_free + 0.5, (dev_free, dev_zone)
