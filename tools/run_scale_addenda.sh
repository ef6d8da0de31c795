#!/bin/bash
# Dev tool: scale addenda for queries added after a base scale run —
# regenerate the corpus if absent, drive Verify for JUST the named
# queries, oracle-compare, and append the results to the round's log.
# Usage: run_scale_addenda.sh <sfdir> <replicas> <logfile> <query...>
set -u
cd /root/repo
SFDIR=$1; REPL=$2; LOG=$3; shift 3
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
SNAP=.tmp/classes_snap_addenda
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP"/
CP="$SNAP:/opt/spark/jars/*"
JAVA="java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

if [ ! -d "$SFDIR" ]; then
  echo "[$(date +%T)] GenScale x$REPL -> $SFDIR"
  $JAVA -Xmx16g -cp "$CP" graft.tools.GenScale /root/testdata/sf0.1 "$SFDIR" "$REPL" \
    > .tmp/genscale_addenda.log 2>&1 || { echo GENSCALE_FAILED; exit 1; }
fi
OUT=.tmp/verify_addenda_$(basename "$SFDIR")
rm -rf "$OUT"
echo "[$(date +%T)] Verify $* at $SFDIR"
$JAVA -Xmx24g -cp "$CP" graft.Verify "$SFDIR" "$OUT" "$@" \
  > .tmp/verify_addenda.log 2>&1 || { echo VERIFY_FAILED; exit 1; }
echo "[$(date +%T)] check.py"
{
  echo "# addendum $(date +%F) queries: $*"
  python3 tools/check.py "$SFDIR" "$OUT" "$@"
} >> "$LOG" 2>&1
rc=$?
echo "[$(date +%T)] done rc=$rc"
tail -4 "$LOG"
exit $rc
