from pcrlv2_tpu.utils.meters import AverageMeter, MetricLogger  # noqa: F401
