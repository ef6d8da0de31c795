#!/bin/bash
# Dev tool: drive Verify over the 26x corpus and run the DuckDB oracle
# compare -> scale_sf26_check_r15.log. Runs from a SNAPSHOT of the
# compiled classes so a concurrent recompile can't tear the run
# (mixed-version class loading). Mirrors build.sbt's fork options.
# Usage: run_scale_sf26.sh [skip-genscale]
set -u
cd /root/repo
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
SNAP=.tmp/classes_snap_sf26
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP"/
CP="$SNAP:/opt/spark/jars/*"
JAVA="java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

if [ "${1:-}" != "skip-genscale" ] && [ ! -d .tmp/sf26 ]; then
  echo "[$(date +%T)] GenScale 26x"
  $JAVA -Xmx16g -cp "$CP" graft.tools.GenScale /root/testdata/sf0.1 .tmp/sf26 26 \
    > .tmp/genscale_sf26.log 2>&1 || { echo GENSCALE_FAILED; exit 1; }
fi
echo "[$(date +%T)] Verify at sf26"
rm -rf .tmp/verify_sf26
$JAVA -Xmx32g -cp "$CP" graft.Verify .tmp/sf26 .tmp/verify_sf26 \
  > .tmp/verify_sf26.log 2>&1 || { echo VERIFY_FAILED; exit 1; }
echo "[$(date +%T)] check.py at sf26"
python3 tools/check.py .tmp/sf26 .tmp/verify_sf26 > scale_sf26_check_r15.log 2>&1
rc=$?
echo "[$(date +%T)] done rc=$rc"
tail -3 scale_sf26_check_r15.log
exit $rc
