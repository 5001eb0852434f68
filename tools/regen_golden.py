"""Regenerate the golden regression image (tests/golden/demo_64.png).

Run ONLY when a render change is intended; commit the new golden with
the change that motivated it."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_golden import GOLDEN, render_golden_frame  # noqa: E402

from drts_tpu.utils import image as image_mod  # noqa: E402

img = render_golden_frame()
image_mod.write_png(GOLDEN, img)
print(f"wrote {GOLDEN} (mean {img.mean():.5f})")
