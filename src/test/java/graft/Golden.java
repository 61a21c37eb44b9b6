package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level tag for the golden program (round-13 verdict ask 4):
 * the InferenceGolden* / GraphGolden / DupSpanGolden derivation
 * anchors are ~40% of full-suite wall and change only when a golden
 * part is added, so the inner loop may exclude them:
 *
 *   sbt -batch 'testOnly * -- -l graft.Golden'     (fast loop)
 *   sbt -batch test                                 (close-out gate)
 *
 * No test is deleted or weakened — the full suite remains the
 * close-out gate, and GoldenCoverageSpec (untagged, fast) still
 * fails the fast loop on any unclassified or silently-anchored
 * query.
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
@Inherited
public @interface Golden {}
