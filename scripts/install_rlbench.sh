#!/bin/bash
# Install CoppeliaSim 4.1 + PyRep + RLBench + Colosseum (host-side simulator;
# same role as the reference's scripts/install_rlbench.sh). The framework's
# TPU side never touches these — they are only needed for real closed-loop
# eval and demo generation (envs/rlbench.py). CI uses envs/fake.py instead.
set -e

COPPELIASIM_ROOT=${COPPELIASIM_ROOT:-$HOME/CoppeliaSim}
if [ ! -d "$COPPELIASIM_ROOT" ]; then
  wget -q https://downloads.coppeliarobotics.com/V4_1_0/CoppeliaSim_Edu_V4_1_0_Ubuntu20_04.tar.xz
  mkdir -p "$COPPELIASIM_ROOT"
  tar -xf CoppeliaSim_Edu_V4_1_0_Ubuntu20_04.tar.xz -C "$COPPELIASIM_ROOT" --strip-components 1
  rm CoppeliaSim_Edu_V4_1_0_Ubuntu20_04.tar.xz
fi
export LD_LIBRARY_PATH=$LD_LIBRARY_PATH:$COPPELIASIM_ROOT
export QT_QPA_PLATFORM_PLUGIN_PATH=$COPPELIASIM_ROOT

pip install git+https://github.com/stepjam/PyRep.git
pip install git+https://github.com/MohitShridhar/RLBench.git@genima
pip install git+https://github.com/MohitShridhar/robot-colosseum.git@genima
echo "RLBench stack installed. Set COPPELIASIM_ROOT/LD_LIBRARY_PATH in your shell."
