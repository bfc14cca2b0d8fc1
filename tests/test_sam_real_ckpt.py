"""Optional integration test with a REAL released SAM checkpoint.

No pretrained checkpoint ships in this image (zero egress), so this is
skipped unless the user provides one via SANERF_SAM_CKPT (or drops it at
the CLI default ./pretrained/sam_vit_h_4b8939.pth).  Purpose (VERDICT r3
next #8): the first contact with real weights should be a test, not a
production run — it exercises build_sam's checkpoint load
(sam/weights.py convert_torch_checkpoint) and one full predict on a
synthetic image, asserting a non-trivial mask.

Reference seam: main.py:258-263 builds the predictor from the same file.
"""
import os

import numpy as np
import pytest

CKPT = os.environ.get("SANERF_SAM_CKPT", "./pretrained/sam_vit_h_4b8939.pth")


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="no real SAM checkpoint provided "
                           "(set SANERF_SAM_CKPT)")
def test_real_checkpoint_loads_and_predicts():
    from sanerf_hq_tpu.sam import build_sam, SamPredictor

    name = os.path.basename(CKPT)
    model_type = ("vit_b" if "vit_b" in name else
                  "vit_l" if "vit_l" in name else "vit_h")
    hq = "hq" in name
    sam = build_sam(model_type, checkpoint=CKPT, hq=hq)
    predictor = SamPredictor(sam)

    # synthetic image with an unambiguous object: dark disk on white
    H = W = 256
    yy, xx = np.mgrid[:H, :W]
    disk = ((yy - 128) ** 2 + (xx - 128) ** 2) < 60 ** 2
    img = np.full((H, W, 3), 255, np.uint8)
    img[disk] = (40, 60, 200)

    predictor.set_image(img)
    masks, scores, _ = predictor.predict(
        point_coords=np.array([[128.0, 128.0]]),
        point_labels=np.array([1]),
        multimask_output=True,
    )
    best = masks[int(np.argmax(scores))]
    inter = np.logical_and(best, disk).sum()
    union = np.logical_or(best, disk).sum()
    # real weights segment the disk; random weights produce degenerate or
    # near-full-frame masks (IoU << 0.5 against the disk)
    assert inter / union > 0.5, f"IoU {inter / union:.3f}"
    assert best.sum() < 0.5 * H * W
