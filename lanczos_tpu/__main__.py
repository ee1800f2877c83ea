from lanczos_tpu.cli import main

main()
