"""gtsam_petercdev_tpu.nonlinear"""
