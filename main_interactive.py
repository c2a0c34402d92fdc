"""Main entry point with class registration and mode dispatch.

Equivalent of /root/reference/main_interactive.py: registers all NeF / trainer /
tracer / grid classes into the config registry (reference lines 34-76), builds
modules, and dispatches ``valid_only`` / ``save_map_only`` / render-views / train
(lines 106-149). The reference's OpenGL interactive viewer has no TPU-pod
equivalent; ``--render-views`` runs the offline orbit renderer
(pagnerf_tpu/app/orbit_renderer.py) which produces the same per-channel
visualisations headlessly.
"""
from __future__ import annotations

import sys


def register_all():
    from pagnerf_tpu.config.config import register_class
    from pagnerf_tpu.config.factory import register_default_classes
    from pagnerf_tpu.models.grids import HashGrid, PermutoGrid, TriplanarGrid
    from pagnerf_tpu.models.tensorf import TensoRFGrid
    from pagnerf_tpu.models.tracer import TracerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer

    register_default_classes()
    register_class(PanopticTrainer, "PanopticTrainer")
    register_class(TracerConfig, "PanopticPackedRFTracer")
    register_class(TracerConfig, "PanopticDDensityPackedRFTracer")
    register_class(TracerConfig, "PackedRFTracer")
    for g in (PermutoGrid, HashGrid, TriplanarGrid, TensoRFGrid):
        register_class(g, g.__name__)


def main(argv=None):
    register_all()
    import main as headless
    return headless.main(argv)


if __name__ == "__main__":
    main(sys.argv[1:])
