"""AP-level end-to-end parity: reference torch detector vs our full eval loop.

The strongest in-env proxy for the "LVIS APr within 0.3" north star
(BASELINE.md): a synthetic LVIS-style mini-dataset is scored twice —

* reference side: the real torch ``CustomRCNN.inference`` built through
  detectron2's config/registry path (``DiverGen/divergen/modeling/meta_arch/
  custom_rcnn.py:87-115,249-332``), its own GPU-semantics mask paste
  (``detectron2/layers/mask_ops.py:74`` via ``ROIMasks.to_bitmasks``),
  converted to LVIS records;
* our side: the full ``do_test`` path (``engine/eval_loop.py`` ⇔
  ``DiverGen/train_net.py:62-126``) — EMA-param selection, DatasetMapper,
  batched pmap inference, inverse transform, native mask paste + RLE —
  over the registered dataset.

Both record sets run through the complete LVIS protocol (federated
pos/neg ignore rule, area ranges, maxDets, APr/APc/APf bucketing) in
``DetEval`` (itself property-tested against the reference's own compiled
``cocoeval.cpp`` in tests/test_cocoeval_oracle.py). AP deltas must stay
≤ 0.01 AP absolute — detection-level parity (count/class/<1px box/0.97
mask IoU, tests/parity/test_full_graph_parity.py) has already pinned the
graphs; this pins the evaluator→AP half of the chain end to end.

GT is built from jittered+dilated reference detections (top det of each
distinct class per image) so AP sits in a meaningful mid range (neither 0
nor 1) and matching happens at multiple IoU thresholds; frequency buckets
are assigned from the GT class histogram so the rare bucket is populated.
"""
import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402

NUM_CLASSES = 6
IMG = 128
N_IMAGES = 24
DATASET = "ap_parity_mini"


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()
    from centernet.modeling.dense_heads.centernet import CenterNet

    if not getattr(CenterNet, "_contig_patched", False):
        orig = CenterNet.predict_single_level

        def patched(self, grids, heatmap, reg_pred, image_sizes, agn_hm,
                    level, is_proposal=False):
            heatmap = heatmap.contiguous(memory_format=torch.channels_last)
            if agn_hm is not None:
                agn_hm = agn_hm.contiguous()
            return orig(self, grids, heatmap, reg_pred.contiguous(),
                        image_sizes, agn_hm, level, is_proposal=is_proposal)

        CenterNet.predict_single_level = patched
        CenterNet._contig_patched = True


def _ref_cfg():
    from centernet.config import add_centernet_config
    from detectron2.config import get_cfg
    from divergen.config import add_divergen_config

    cfg = get_cfg()
    add_centernet_config(cfg)
    add_divergen_config(cfg)
    m = cfg.MODEL
    m.META_ARCHITECTURE = "CustomRCNN"
    m.DEVICE = "cpu"
    m.PIXEL_MEAN = [123.675, 116.28, 103.53]
    m.PIXEL_STD = [58.395, 57.12, 57.375]
    m.BACKBONE.NAME = "build_p67_resnet_fpn_backbone"
    m.RESNETS.DEPTH = 50
    m.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    m.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    m.PROPOSAL_GENERATOR.NAME = "CenterNet"
    m.CENTERNET.ONLY_PROPOSAL = True
    m.CENTERNET.WITH_AGN_HM = True
    m.CENTERNET.NUM_CLASSES = NUM_CLASSES
    m.CENTERNET.INFERENCE_TH = 0.01
    m.CENTERNET.PRE_NMS_TOPK_TEST = 256
    m.CENTERNET.POST_NMS_TOPK_TEST = 64
    m.CENTERNET.NMS_TH_TEST = 0.7
    m.ROI_HEADS.NAME = "DeticCascadeROIHeads"
    m.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    m.ROI_HEADS.IN_FEATURES = ["p3", "p4", "p5"]
    m.ROI_HEADS.SCORE_THRESH_TEST = 0.02
    m.ROI_HEADS.NMS_THRESH_TEST = 0.5
    m.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    m.ROI_BOX_HEAD.NUM_FC = 2
    m.ROI_BOX_HEAD.FC_DIM = 64
    m.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    m.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    m.ROI_BOX_HEAD.MULT_PROPOSAL_SCORE = True
    m.ROI_BOX_HEAD.USE_SIGMOID_CE = True
    m.MASK_ON = True
    m.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
    m.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = True
    m.ROI_MASK_HEAD.NUM_CONV = 2
    m.ROI_MASK_HEAD.CONV_DIM = 32
    m.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.TEST.DETECTIONS_PER_IMAGE = 64
    return cfg


def _our_cfg(tmp):
    from divergen_tpu.config import get_cfg

    cfg = get_cfg()
    m = cfg.MODEL
    m.RESNETS.DEPTH = 50
    m.CENTERNET.NUM_CLASSES = NUM_CLASSES
    m.CENTERNET.INFERENCE_TH = 0.01
    m.CENTERNET.PRE_NMS_TOPK_TEST = 256
    m.CENTERNET.POST_NMS_TOPK_TEST = 64
    m.CENTERNET.NMS_TH_TEST = 0.7
    m.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    m.ROI_HEADS.SCORE_THRESH_TEST = 0.02
    m.ROI_HEADS.NMS_THRESH_TEST = 0.5
    m.ROI_BOX_HEAD.NUM_FC = 2
    m.ROI_BOX_HEAD.FC_DIM = 64
    m.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    m.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    m.ROI_BOX_HEAD.MULT_PROPOSAL_SCORE = True
    m.ROI_BOX_HEAD.USE_SIGMOID_CE = True
    m.MASK_ON = True
    m.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = True
    m.ROI_MASK_HEAD.NUM_CONV = 2
    m.ROI_MASK_HEAD.CONV_DIM = 32
    m.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.TEST.DETECTIONS_PER_IMAGE = 64
    cfg.TEST.NMS_CANDIDATES = 256
    cfg.FP16 = False
    cfg.INPUT.MIN_SIZE_TEST = IMG
    cfg.INPUT.MAX_SIZE_TEST = IMG
    cfg.INPUT.TEST_SIZE = IMG
    cfg.DATASETS.TEST = (DATASET,)
    cfg.OUTPUT_DIR = str(tmp)
    return cfg


def _dilate(mask: np.ndarray, it: int = 2) -> np.ndarray:
    """3x3 binary dilation, `it` times (numpy shifts — no cv2 dependency)."""
    m = mask.astype(bool)
    for _ in range(it):
        p = np.pad(m, 1)
        m = (
            p[:-2, 1:-1] | p[2:, 1:-1] | p[1:-1, :-2] | p[1:-1, 2:]
            | p[1:-1, 1:-1] | p[:-2, :-2] | p[:-2, 2:] | p[2:, :-2] | p[2:, 2:]
        )
    return m


@pytest.mark.slow
def test_ap_level_parity(tmp_path):
    import jax
    import jax.numpy as jnp
    from detectron2.modeling import build_model as ref_build
    from PIL import Image

    import divergen.modeling.meta_arch.custom_rcnn  # noqa: F401 (registers)
    import divergen.modeling.roi_heads.detic_roi_heads  # noqa: F401
    from divergen_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from divergen_tpu.engine.eval_loop import do_test
    from divergen_tpu.evaluation.lvis_evaluator import LVISEvaluator
    from divergen_tpu.modeling.meta_arch.rcnn import build_model
    from divergen_tpu.utils.mask_codec import rle_encode
    from divergen_tpu.utils.torch_weights import load_d2_detector_into

    torch.manual_seed(0)
    ref = ref_build(_ref_cfg())
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # ---- synthetic mini-dataset: structured noise so detections vary ----
    rng = np.random.RandomState(11)
    images = []
    for i in range(N_IMAGES):
        base = rng.rand(IMG, IMG, 3) * 255
        # a couple of bright rectangles per image give the random-weight
        # detector spatial structure to key on (detection diversity)
        for _ in range(3):
            x, y = rng.randint(0, IMG - 48, 2)
            w, h = rng.randint(24, 48, 2)
            base[y:y + h, x:x + w] = rng.rand(3) * 255
        images.append(base.astype(np.float32))

    # ---- reference detections (its own full inference + mask paste) ----
    ref_dets = []  # per image: dict of arrays
    with torch.no_grad():
        for i, img in enumerate(images):
            out = ref.inference([{
                "image": torch.from_numpy(img.transpose(2, 0, 1)),
                "file_name": f"im_{i}.png", "height": IMG, "width": IMG,
            }])
            inst = out[0]["instances"]
            ref_dets.append({
                "boxes": inst.pred_boxes.tensor.numpy(),
                "scores": inst.scores.numpy(),
                "classes": inst.pred_classes.numpy(),
                "masks": inst.pred_masks.numpy().astype(bool),
            })
    n_total = sum(len(d["scores"]) for d in ref_dets)
    assert n_total >= 3 * N_IMAGES, f"degenerate reference output ({n_total})"

    # ---- GT: jittered boxes + dilated masks from the top reference dets
    cat_ids = list(range(1, NUM_CLASSES + 1))  # contiguous i -> id i+1
    annotations, image_recs = [], []
    ann_id = 1
    jrng = np.random.RandomState(5)
    for i, d in enumerate(ref_dets):
        # top det of each distinct class (up to 4): class-diverse GT so
        # several categories (and hence all three frequency buckets) exist
        by_cls = {}
        for t in np.argsort(-d["scores"]):
            by_cls.setdefault(int(d["classes"][t]), t)
        top = sorted(by_cls.values(), key=lambda t: -d["scores"][t])[:4]
        pos = set()
        for t in top:
            if not d["masks"][t].any():
                continue
            x1, y1, x2, y2 = d["boxes"][t] + jrng.uniform(-3, 3, 4)
            x1, x2 = np.clip([x1, x2], 0, IMG)
            y1, y2 = np.clip([y1, y2], 0, IMG)
            if x2 - x1 < 2 or y2 - y1 < 2:
                continue
            gmask = _dilate(d["masks"][t], it=2)
            rle = rle_encode(gmask)
            rle["counts"] = rle["counts"].decode()
            cat = int(d["classes"][t]) + 1
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "area": float(gmask.sum()), "segmentation": rle, "iscrowd": 0,
            })
            pos.add(cat)
            ann_id += 1
        # LVIS federated rule: even images exhaustively annotated (all
        # non-positive cats negative); odd images only evaluate positives
        neg = [c for c in cat_ids if c not in pos] if i % 2 == 0 else []
        image_recs.append({
            "id": i, "height": IMG, "width": IMG, "file_name": f"im_{i}.png",
            "neg_category_ids": neg, "pos_category_ids": sorted(pos),
            "not_exhaustive_category_ids": [],
        })
    # ---- frequency buckets from the GT class histogram: least-annotated
    # class is "rare", next "common", rest (incl. GT-absent) "frequent" —
    # guarantees the APr bucket is populated with real match opportunities
    hist = np.zeros(NUM_CLASSES, int)
    for a in annotations:
        hist[a["category_id"] - 1] += 1
    seen = [int(c) for c in np.argsort(hist) if hist[c] > 0][::-1]  # desc
    assert len(seen) >= 2, f"need >=2 GT classes for APr (hist={hist})"
    freq_of_class = {c: "f" for c in range(NUM_CLASSES)}
    freq_of_class[seen[-1]] = "r"
    if len(seen) >= 3:
        freq_of_class[seen[-2]] = "c"

    gt_json = {
        "images": image_recs,
        "annotations": annotations,
        "categories": [
            {"id": c, "name": f"cat_{c}", "frequency": freq_of_class[c - 1],
             "image_count": 1, "instance_count": 1}
            for c in cat_ids
        ],
    }
    json_path = tmp_path / "gt.json"
    json_path.write_text(json.dumps(gt_json))
    for i, img in enumerate(images):
        Image.fromarray(img.astype(np.uint8)).save(tmp_path / f"im_{i}.png")

    records = [
        {"file_name": str(tmp_path / f"im_{i}.png"), "image_id": i,
         "height": IMG, "width": IMG}
        for i in range(N_IMAGES)
    ]
    if DATASET in DatasetCatalog:
        DatasetCatalog.remove(DATASET)
        MetadataCatalog.remove(DATASET)
    DatasetCatalog.register(DATASET, lambda: records)
    MetadataCatalog.get(DATASET).set(
        json_file=str(json_path), evaluator_type="lvis"
    )

    # ---- reference side through the full LVIS protocol ----
    ref_ev = LVISEvaluator(DATASET)
    for i, d in enumerate(ref_dets):
        for t in range(len(d["scores"])):
            x1, y1, x2, y2 = d["boxes"][t]
            rle = rle_encode(d["masks"][t])
            rle["counts"] = rle["counts"].decode()
            ref_ev._predictions.append({
                "image_id": i, "category_id": int(d["classes"][t]) + 1,
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "score": float(d["scores"][t]), "segmentation": rle,
            })
    ref_res = ref_ev.evaluate()

    # ---- our side: converted weights, EMA-selected params, full do_test
    cfg = _our_cfg(tmp_path)
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    im0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    sz0 = jnp.asarray([[IMG, IMG]], jnp.int32)
    gt0 = {
        "boxes": jnp.asarray([[[4.0, 4, 30, 30]] * 4]),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "valid": jnp.asarray([[True] + [False] * 3]),
        "masks": jnp.ones((1, 4, cfg.MODEL.ROI_MASK_HEAD.GT_SIDE,
                           cfg.MODEL.ROI_MASK_HEAD.GT_SIDE), jnp.float32),
        "instance_source": jnp.zeros((1, 4), jnp.int32),
    }
    params = jax.jit(
        lambda: model.init(key, im0, sz0, gt=gt0, rng=key, training=True)
    )()
    params = jax.tree.map(jnp.asarray, load_d2_detector_into(params, sd, cfg=cfg))
    # EMA-eval path (train_net.py:63-64): params live in ema_params; the raw
    # params slot holds garbage so a wrong selection fails loudly
    state = SimpleNamespace(
        ema_params=params, params=jax.tree.map(jnp.zeros_like, params)
    )
    our_res = do_test(cfg, model=model, state=state)[DATASET]

    for task in ("bbox", "segm"):
        for k in ("AP", "AP50", "AP75", "APr", "APc", "APf"):
            r, o = ref_res[task][k], our_res[task][k]
            assert abs(r - o) <= 0.01, (
                f"{task} {k}: ref={r:.4f} ours={o:.4f} "
                f"(full: ref={ref_res[task]} ours={our_res[task]})"
            )
    # non-degenerate: mid-range AP so matching happened at several IoU
    # thresholds on both sides
    assert 0.05 < ref_res["bbox"]["AP"] < 0.99, ref_res["bbox"]
    assert 0.05 < ref_res["segm"]["AP"] < 0.99, ref_res["segm"]
