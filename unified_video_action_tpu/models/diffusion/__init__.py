from unified_video_action_tpu.models.diffusion.gaussian import (
    GaussianDiffusion,
    create_diffusion,
    space_timesteps,
)

__all__ = ["GaussianDiffusion", "create_diffusion", "space_timesteps"]
