"""Layout post-processing: NMS, mask->boxes, DIT/YOLO filters, providers,
and the LayoutT5 auxiliary loss."""

import numpy as np
import pytest

from rag_docvqa_tpu.models.layout import (
    LayoutProvider,
    filter_detections_dit,
    filter_detections_yolo,
    mask_to_boxes,
    non_maximum_suppression,
    segmentation_to_layout,
)


def test_nms_keeps_biggest():
    boxes = [
        [0, 0, 10, 10],  # big
        [1, 1, 9, 9],  # heavily overlapping smaller -> dropped
        [20, 20, 25, 25],  # disjoint -> kept
    ]
    keep = non_maximum_suppression(boxes, iou_threshold=0.5)
    assert set(keep) == {0, 2}


def test_mask_to_boxes_components():
    m = np.zeros((10, 12), bool)
    m[1:4, 1:5] = True
    m[6:9, 7:11] = True
    boxes = sorted(mask_to_boxes(m))
    assert boxes == [[1, 1, 5, 4], [7, 6, 11, 9]]


def test_mask_to_boxes_diagonal_connectivity():
    m = np.zeros((4, 4), bool)
    m[0, 0] = True
    m[1, 1] = True  # 8-connected -> one component
    assert len(mask_to_boxes(m)) == 1


def test_segmentation_to_layout():
    seg = np.zeros((20, 20), np.int32)
    seg[2:8, 2:18] = 10  # Text
    seg[12:18, 2:9] = 9  # Table
    boxes, labels = segmentation_to_layout(seg)
    assert sorted(labels) == [9, 10]


def test_filter_dit_remap_and_containment():
    # raw labels: 10=Text->1, 9=Table->3, 0=Background->dropped
    boxes = [[0, 0, 100, 100], [10, 10, 90, 90], [0, 0, 5, 5]]
    labels = [10, 9, 0]
    out_boxes, out_labels = filter_detections_dit(boxes, labels, image_size=(100, 100))
    # inner table contained >=0.5 in larger text box -> filtered; bg dropped
    assert out_labels == [1]
    assert out_boxes[0] == [0.0, 0.0, 1.0, 1.0]


def test_filter_yolo():
    boxes = [[0, 0, 0.5, 0.5], [0.01, 0.01, 0.49, 0.49], [0.6, 0.6, 0.9, 0.9]]
    labels = [1, 2, 8]  # 1->text, 2->text, 8->dropped
    out_boxes, out_labels = filter_detections_yolo(boxes, labels, iou_threshold=0.5)
    assert len(out_boxes) == 1 and out_labels == [1]


def test_layout_provider_precomputed():
    pre = {"img0": {"boxes": [[0, 0, 1, 1]], "labels": [1]}}
    prov = LayoutProvider(precomputed=pre)
    out = prov.batch_forward([[None, None]], keys=[["img0", "missing"]])
    assert out[0][0]["labels"] == [1]
    assert out[0][1]["boxes"] == []


@pytest.mark.slow
def test_layout_t5_aux_loss():
    import jax
    import jax.numpy as jnp

    from rag_docvqa_tpu.data.contract import GeneratorInputs
    from rag_docvqa_tpu.models import t5 as t5m, vt5 as vt5m
    from rag_docvqa_tpu.models.embeddings import SpatialConfig
    from rag_docvqa_tpu.models.vit import ViTConfig

    cfg = vt5m.VT5Config(
        t5=t5m.T5Config(vocab_size=100, d_model=16, d_kv=4, num_heads=4, d_ff=32,
                        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0),
        spatial=SpatialConfig(hidden_size=16, dropout_rate=0.0),
        vit=ViTConfig(hidden_size=8, num_layers=1, num_heads=1, mlp_dim=16, patch_size=8, image_size=16),
        use_layout_labels="Embed",
        use_visual=False,
        layout_loss_weight=1.0,
    )
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), cfg)
    assert "layout_head" in params and "layout_emb" in params

    rng = np.random.RandomState(0)
    gen = GeneratorInputs(
        input_ids=jnp.asarray(rng.randint(3, 100, (2, 12)), jnp.int32),
        input_boxes=jnp.asarray(rng.randint(0, 1000, (2, 12, 4)), jnp.int32),
        input_labels=jnp.asarray(rng.randint(0, 4, (2, 12)), jnp.int32),
        attention_mask=jnp.ones((2, 12), bool),
    )
    labels = jnp.asarray([[5, 1, -100], [7, 1, -100]], jnp.int32)
    loss_with, _ = vt5m.forward_train(params, cfg, gen, labels)

    cfg_plain = vt5m.VT5Config(
        t5=cfg.t5, spatial=cfg.spatial, vit=cfg.vit, use_visual=False,
    )
    params_plain = {k: v for k, v in params.items() if k not in ("layout_head", "layout_emb", "layout_scale")}
    loss_plain, _ = vt5m.forward_train(params_plain, cfg_plain, gen, labels)
    # layout CE adds a positive term
    assert float(loss_with) > float(loss_plain) - 1e-6
    # layout head gets gradient
    g = jax.grad(lambda p: vt5m.forward_train(p, cfg, gen, labels)[0])(params)
    assert np.abs(np.asarray(g["layout_head"]["kernel"])).sum() > 0
