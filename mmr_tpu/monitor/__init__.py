from mmr_tpu.monitor.monitor import TrainingMonitor, get_logger, ProfilerTrace, model_summary  # noqa: F401
from mmr_tpu.monitor.plots import save_losses, save_dashboard, save_triptychs, save_accuracy_curves  # noqa: F401
