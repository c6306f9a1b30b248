#!/bin/bash
cd /root/repo
export SPARK_GRAFT_BENCH_BUDGET_S=4200
sbt -batch "runMain graft.Bench" > logs/bench_r5_record.log 2>&1
echo "BENCH_EXIT=$?" >> logs/bench_r5_record.log
