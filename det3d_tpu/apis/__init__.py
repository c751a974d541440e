from det3d_tpu.apis.train import (batch_to_device, build_stack,
                                  eval_detector, train_detector)

__all__ = ["build_stack", "train_detector", "eval_detector",
           "batch_to_device"]
