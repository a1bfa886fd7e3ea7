from .schedule import (
    DDPMSchedule,
    FlowSchedule,
    guidance_scale_embedding,
    make_ddpm_schedule,
    make_flow_schedule,
)
from .solver import (
    PhasedDDIMSolver,
    PhasedEulerSolver,
    boundary_scalings,
    last_boundary_at_or_below,
    phase_boundaries,
    solver_grid,
)
from .losses import (
    cfg_combine,
    consistency_loss,
    feature_matching_loss,
    hinge_d_loss,
    hinge_g_loss,
    huber_loss,
    l2_loss,
)
