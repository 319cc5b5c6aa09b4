from gta_tpu.utils.metrics import mse2psnr, psnr, ssim
