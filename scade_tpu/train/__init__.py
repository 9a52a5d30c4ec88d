"""SCADE training: one jitted step + a thin host loop.

The reference's 500k-iteration Python loop (run_scade_scannet.py:830-1089)
does per-step host work: np.random image/pixel choice, tensor gathers, a
chunked render, loss assembly, two Adam steps, an LR-schedule check. Here
ALL of that is one compiled XLA program (`make_train_step`): batch sampling
happens on-device from resident scene tensors, rays are generated only at
the sampled pixels, and both optimizers (MLPs; per-image depth scale/shift)
update inside the same program. The host loop only splits RNG keys and
handles checkpoint/log cadence.
"""

from scade_tpu.train.step import (  # noqa: F401
    SceneTensors,
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    scene_tensors_from_scene,
    staircase_lr,
)
