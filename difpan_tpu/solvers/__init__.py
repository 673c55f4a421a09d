from .dpm_solver import NoiseScheduleVP, model_wrapper, DPMSolver
