"""End-to-end learning test: the full avatar system must fit target renders.

Slow (~10 min CPU); gated behind RUN_SLOW=1. Last verified result:
PSNR 10.56 -> 22.85 dB (+12.3) over 300 steps on the synthetic setup.
"""
import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1",
    reason="slow convergence test; set RUN_SLOW=1",
)


def test_avatar_system_converges():
    from exavatar_release_tpu.tools.convergence_demo import main

    delta = main(steps=300, improvement_db=5.0)
    assert delta > 5.0
