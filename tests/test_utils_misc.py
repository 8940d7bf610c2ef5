"""Small-parity tests: MultiStepLR schedule, AverageValueMeter, resize_padding."""

import numpy as np
import pytest
from PIL import Image

from pose3d_tpu.train import multistep_lr, torch_style_adam
from pose3d_tpu.utils import AverageValueMeter
from pose3d_tpu.data import transforms as T


def test_multistep_lr_boundaries():
    sched = multistep_lr(1e-4, [100], gamma=0.1)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(99)) == pytest.approx(1e-4)
    assert float(sched(100)) == pytest.approx(1e-5)
    assert float(sched(500)) == pytest.approx(1e-5)


def test_torch_style_adam_first_step_is_sign_like():
    """torch Adam parity: first update magnitude ~ lr * g/(|g| + eps)."""
    import jax.numpy as jnp

    tx = torch_style_adam(1e-3, weight_decay=0.0)
    params = {"w": jnp.zeros(3)}
    grads = {"w": jnp.asarray([1.0, -2.0, 0.5])}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # bias-corrected first Adam step = -lr * sign(g) (eps-negligible)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               [-1e-3, 1e-3, -1e-3], rtol=1e-4)


def test_average_value_meter_weighted():
    m = AverageValueMeter()
    m.update(1.0, n=1)
    m.update(2.0, n=3)
    # reference semantics: weighted running mean (utils.py:86-89)
    assert m.avg == pytest.approx((1.0 * 1 + 2.0 * 3) / 4)
    assert m.count == 4
    m.reset()
    assert m.avg == 0.0 and m.count == 0


def test_resize_padding_paste_on_black():
    im = Image.new("RGB", (50, 100), (0, 255, 0))
    out = T.resize_padding(im, 64)
    assert out.size == (64, 64)
    arr = np.asarray(out)
    assert arr[32, 32, 1] == 255  # center is image
    assert tuple(arr[32, 2]) == (0, 0, 0)  # left border is black pad
