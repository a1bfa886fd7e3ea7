from .ddim import DDIMSampler, TCDSampler, trailing_timesteps
from .pcm_fm import PCMFMSampler, pcm_fm_sigmas
from .pipeline import TextToImagePipeline
