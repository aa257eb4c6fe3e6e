from doa_mpc_tpu.cli import main

main()
