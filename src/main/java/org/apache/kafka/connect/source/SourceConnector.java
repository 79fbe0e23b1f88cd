/* Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java. */
package org.apache.kafka.connect.source;

import org.apache.kafka.connect.connector.Connector;

public abstract class SourceConnector extends Connector {
}
