"""Top-level launcher — same invocation shape as the reference's ``main.py``
(``python main.py --b 32 --epochs 240 --lr 1e-3 --output ... --n luna --d 3
--gpus 0,1,2,3 --ratio 1.0 --amp``, reference ``run3d.sh``)."""

from pcrlv2_tpu.cli.main import main

if __name__ == "__main__":
    main()
