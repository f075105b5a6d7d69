from pcodec_tpu.cli import main

main()
